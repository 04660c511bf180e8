"""One-pass table profiling — per-column data-quality statistics
(training-pipeline closure operator, SURVEY.md §2.11 C46; the Deequ /
Great-Expectations-shaped validation step a pipeline runs before
committing 100 TB to a training run).

The whole profile is ONE aggregation job: every column contributes a
fixed set of agg expressions (null count, approx distinct, type-suited
min/max/moments), all map-side combined, and the driver receives a
single row of scalars — O(#columns) driver state regardless of table
size. No per-column jobs, no second pass, no collect of data rows.

`profile_drift` compares two profiles (e.g. yesterday's corpus vs
today's) column by column — null-rate jumps, cardinality collapses,
range shifts — the cheap early-warning layer in a recurring ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERED = _NUMERIC + (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
) -> dict:
    """{"n_rows": N, "columns": {name: {...stats...}}} from ONE pass.

    Per column: ``n_nulls``, ``null_rate``, ``approx_distinct`` (HLL++,
    relative sd ``rsd``); numeric columns add min/max/mean/stddev;
    string columns add min/max/avg length; date/timestamp add min/max.
    Array columns add avg/max element count. Binary/struct/map columns
    report nulls+distinct only (distinct over the raw bytes for
    binary). Column set defaults to the full schema.
    """
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, n = F.col(f.name), f.name
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{n} nulls"))
        if isinstance(f.dataType, (T.MapType, T.StructType)):
            # not hashable by approx_count_distinct; cardinality via
            # the json rendering (exact enough for drift detection)
            aggs.append(
                F.approx_count_distinct(F.to_json(c), rsd).alias(f"{n} dist")
            )
        else:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"{n} dist"))
        if isinstance(f.dataType, _NUMERIC):
            aggs += [
                F.min(c).alias(f"{n} min"),
                F.max(c).alias(f"{n} max"),
                F.avg(c).alias(f"{n} mean"),
                F.stddev(c).alias(f"{n} std"),
            ]
        elif isinstance(f.dataType, T.StringType):
            aggs += [
                F.min(F.length(c)).alias(f"{n} minlen"),
                F.max(F.length(c)).alias(f"{n} maxlen"),
                F.avg(F.length(c)).alias(f"{n} avglen"),
            ]
        elif isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            aggs += [
                F.min(c).alias(f"{n} min"),
                F.max(c).alias(f"{n} max"),
            ]
        elif isinstance(f.dataType, T.ArrayType):
            aggs += [
                F.avg(F.size(c)).alias(f"{n} avgsize"),
                F.max(F.size(c)).alias(f"{n} maxsize"),
            ]
    row = df.agg(*aggs).first().asDict()
    total = row["__n"]
    out: dict = {"n_rows": total, "columns": {}}
    for f in fields:
        n = f.name
        stats = {
            "type": f.dataType.simpleString(),
            "n_nulls": int(row[f"{n} nulls"] or 0),
            "null_rate": (row[f"{n} nulls"] or 0) / total if total else 0.0,
            "approx_distinct": int(row[f"{n} dist"] or 0),
        }
        for suffix in ("min", "max", "mean", "std", "minlen", "maxlen", "avglen",
                       "avgsize", "maxsize"):
            key = f"{n} {suffix}"
            if key in row:
                v = row[key]
                stats[suffix] = v if not hasattr(v, "isoformat") else v.isoformat()
        out["columns"][n] = stats
    return out


def profile_drift(
    before: dict,
    after: dict,
    null_rate_jump: float = 0.05,
    distinct_ratio: float = 0.5,
) -> list[dict]:
    """Column-level drift findings between two `profile_table` outputs:
    appeared/vanished columns, type changes, null-rate jumps above
    ``null_rate_jump`` (absolute), and approx-distinct collapses/blow-ups
    beyond ``distinct_ratio`` (relative, either direction). Driver-side
    arithmetic on two small dicts — no Spark jobs."""
    findings: list[dict] = []
    b_cols, a_cols = before["columns"], after["columns"]
    for name in sorted(set(b_cols) | set(a_cols)):
        if name not in a_cols:
            findings.append({"column": name, "kind": "vanished"})
            continue
        if name not in b_cols:
            findings.append({"column": name, "kind": "appeared"})
            continue
        b, a = b_cols[name], a_cols[name]
        if b["type"] != a["type"]:
            findings.append(
                {"column": name, "kind": "type_change",
                 "before": b["type"], "after": a["type"]}
            )
        jump = abs(a["null_rate"] - b["null_rate"])
        if jump > null_rate_jump:
            findings.append(
                {"column": name, "kind": "null_rate_jump",
                 "before": round(b["null_rate"], 4),
                 "after": round(a["null_rate"], 4)}
            )
        bd, ad = max(b["approx_distinct"], 1), max(a["approx_distinct"], 1)
        ratio = ad / bd
        if ratio < distinct_ratio or ratio > 1 / distinct_ratio:
            findings.append(
                {"column": name, "kind": "distinct_shift",
                 "before": b["approx_distinct"], "after": a["approx_distinct"],
                 "ratio": round(ratio, 3)}
            )
    return findings


def check_table(df: DataFrame, checks: list[dict], rsd: float = 0.05) -> list[dict]:
    """Declarative data-quality expectations, ALL evaluated in one
    aggregation pass (the Deequ VerificationSuite shape — C46's second
    half): each check compiles to agg expressions, the driver receives
    one row of scalars and renders verdicts.

    Check forms (dicts):
      {"check": "not_null",  "column": c}                  — no NULLs
      {"check": "unique",    "column": c}                  — exact count == exact distinct
      {"check": "between",   "column": c, "min": x, "max": y}
      {"check": "in_set",    "column": c, "values": [...]}
      {"check": "matches",   "column": c, "pattern": re}   — full-match RLIKE
      {"check": "min_distinct", "column": c, "value": k}   — approx (HLL, rsd)
      {"check": "row_count_between", "min": x, "max": y}   — table-level

    Returns one {"check", "column", "passed", "observed"} per input;
    "observed" is the violating-row count (or the measured value for
    the scalar checks). NULLs violate `between`/`in_set`/`matches`
    ONLY if the same column also has a `not_null` check — otherwise
    they are skipped (compose checks to demand both).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, ck in enumerate(checks):
        kind = ck["check"]
        if kind == "row_count_between":
            continue
        c = F.col(ck["column"])
        if kind == "not_null":
            aggs.append(F.sum(c.isNull().cast("long")).alias(f"__c{i}"))
        elif kind == "unique":
            aggs.append(F.count(c).alias(f"__c{i}_n"))
            aggs.append(F.count_distinct(c).alias(f"__c{i}_d"))
        elif kind == "between":
            bad = ~c.between(F.lit(ck["min"]), F.lit(ck["max"]))
            aggs.append(F.sum(F.coalesce(bad, F.lit(False)).cast("long")).alias(f"__c{i}"))
        elif kind == "in_set":
            bad = ~c.isin(*ck["values"])
            aggs.append(F.sum(F.coalesce(bad, F.lit(False)).cast("long")).alias(f"__c{i}"))
        elif kind == "matches":
            bad = ~c.rlike(ck["pattern"])
            aggs.append(F.sum(F.coalesce(bad, F.lit(False)).cast("long")).alias(f"__c{i}"))
        elif kind == "min_distinct":
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__c{i}"))
        else:
            raise ValueError(f"unknown check kind: {kind}")
    row = df.agg(*aggs).first().asDict()
    out = []
    for i, ck in enumerate(checks):
        kind = ck["check"]
        if kind == "row_count_between":
            n = row["__n"]
            passed = ck.get("min", 0) <= n <= ck.get("max", float("inf"))
            out.append({"check": kind, "column": None, "passed": passed, "observed": n})
        elif kind == "unique":
            n, d = row[f"__c{i}_n"], row[f"__c{i}_d"]
            out.append(
                {"check": kind, "column": ck["column"], "passed": n == d,
                 "observed": n - d}
            )
        elif kind == "min_distinct":
            d = row[f"__c{i}"]
            out.append(
                {"check": kind, "column": ck["column"],
                 "passed": d >= ck["value"], "observed": d}
            )
        else:
            bad = int(row[f"__c{i}"] or 0)
            out.append(
                {"check": kind, "column": ck["column"], "passed": bad == 0,
                 "observed": bad}
            )
    return out

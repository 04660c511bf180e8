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


def _column_aggs(f, rsd: float) -> list[tuple[str, "F.Column"]]:
    """(suffix, agg expression) pairs for one schema field — the
    per-column stat set profile_table assembles into its one-pass
    aggregation. Shared with `profile_aggs` (the relational form the
    declared queries fold into grouped reports)."""
    c, out = F.col(f.name), []
    out.append(("nulls", F.sum(c.isNull().cast("long"))))
    if isinstance(f.dataType, (T.MapType, T.StructType)):
        # not hashable by approx_count_distinct; cardinality via
        # the json rendering (exact enough for drift detection)
        out.append(("dist", F.approx_count_distinct(F.to_json(c), rsd)))
    else:
        out.append(("dist", F.approx_count_distinct(c, rsd)))
    if isinstance(f.dataType, _NUMERIC):
        out += [
            ("min", F.min(c)),
            ("max", F.max(c)),
            ("mean", F.avg(c)),
            ("std", F.stddev(c)),
        ]
    elif isinstance(f.dataType, T.StringType):
        out += [
            ("minlen", F.min(F.length(c))),
            ("maxlen", F.max(F.length(c))),
            ("avglen", F.avg(F.length(c))),
        ]
    elif isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        out += [("min", F.min(c)), ("max", F.max(c))]
    elif isinstance(f.dataType, T.ArrayType):
        out += [("avgsize", F.avg(F.size(c))), ("maxsize", F.max(F.size(c)))]
    return out


def profile_aggs(
    df: DataFrame,
    columns: list[str] | None = None,
    deterministic_only: bool = True,
) -> list["F.Column"]:
    """The profiler's per-column stats as ALIASED agg expressions
    (``<col>__<stat>``) for use inside any groupBy/rollup — per-group
    data profiling folded into an existing aggregation instead of a
    second pass. ``deterministic_only`` drops the sketch (HLL) and
    accumulation-order-sensitive (mean/std/avg) stats so the result is
    exactly reproducible across engines — the form a DuckDB oracle can
    check."""
    skip = {"dist", "mean", "std", "avglen", "avgsize"} if deterministic_only else set()
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    return [
        c.alias(f"{f.name}__{suffix}")
        for f in fields
        for suffix, c in _column_aggs(f, 0.05)
        if suffix not in skip
    ]


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
        aggs += [
            c.alias(f"{f.name} {suffix}")
            for suffix, c in _column_aggs(f, rsd)
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
    mean_shift_stds: float | None = None,
) -> list[dict]:
    """Column-level drift findings between two `profile_table` outputs:
    appeared/vanished columns, type changes, null-rate jumps above
    ``null_rate_jump`` (absolute), and approx-distinct collapses/blow-ups
    beyond ``distinct_ratio`` (relative, either direction). With
    ``mean_shift_stds`` set, numeric columns additionally flag a
    ``mean_shift`` when the mean moved more than that many baseline
    standard deviations — the distribution-shift signal the streaming
    ANN gate's quantizer-drift policy keys on. Driver-side arithmetic on
    two small dicts — no Spark jobs."""
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
        if (
            mean_shift_stds is not None
            and b.get("mean") is not None
            and a.get("mean") is not None
        ):
            scale = max(b.get("std") or 0.0, 1e-9)
            if abs(a["mean"] - b["mean"]) > mean_shift_stds * scale:
                findings.append(
                    {"column": name, "kind": "mean_shift",
                     "before": round(b["mean"], 6),
                     "after": round(a["mean"], 6),
                     "stds": round(abs(a["mean"] - b["mean"]) / scale, 2)}
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


# ---------------------------------------------------------------------------
# Mergeable profile sketches — the incremental form of `profile_table`
# (same design stance as the C40 corpus sketches: each batch contributes
# one constant-size row; "profile so far" is an aggregation over
# #batches rows, never a corpus rescan).

def profile_sketch(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ONE-row mergeable profile of a batch. Per column: null count,
    HLL sketch (Spark-native `hll_sketch_agg` — register-wise max merge,
    so merged == one-shot), and type-suited MERGEABLE accumulators:
    min/max plus (sum, sum-of-squares) for numerics — mean/std are
    DERIVED at render time, never stored (averages don't merge; sums
    do). String/array columns accumulate length/size sums the same way.
    """
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, n = F.col(f.name), f.name
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{n} nulls"))
        # hll_sketch_agg accepts int/long/string/binary ONLY — normalize
        # every other type to a canonical string rendering (stable, so
        # merged batches agree on identity).
        if isinstance(f.dataType, (T.MapType, T.StructType, T.ArrayType)):
            hll_in = F.to_json(c)
        elif isinstance(
            f.dataType, (T.StringType, T.BinaryType, T.IntegerType, T.LongType)
        ):
            hll_in = c
        else:
            hll_in = c.cast("string")
        aggs.append(F.hll_sketch_agg(hll_in).alias(f"{n} hll"))
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            aggs += [F.min(c).alias(f"{n} min"), F.max(c).alias(f"{n} max")]
        if isinstance(f.dataType, _NUMERIC):
            d = c.cast("double")
            aggs += [
                F.min(c).alias(f"{n} min"),
                F.max(c).alias(f"{n} max"),
                F.sum(d).alias(f"{n} sum"),
                F.sum(d * d).alias(f"{n} sumsq"),
            ]
        elif isinstance(f.dataType, T.StringType):
            ln = F.length(c).cast("double")
            aggs += [
                F.min(F.length(c)).alias(f"{n} minlen"),
                F.max(F.length(c)).alias(f"{n} maxlen"),
                F.sum(ln).alias(f"{n} lensum"),
            ]
        elif isinstance(f.dataType, T.ArrayType):
            sz = F.size(c).cast("double")
            aggs += [
                F.max(F.size(c)).alias(f"{n} maxsize"),
                F.sum(sz).alias(f"{n} sizesum"),
            ]
    return df.agg(*aggs)


def merge_profile_sketches(sketches: DataFrame) -> DataFrame:
    """Merge per-batch sketch rows into one: counts/sums by SUM, min/max
    by MIN/MAX, HLL sketches by `hll_union_agg` — every accumulator is
    associative, so merged == the one-shot sketch of the union."""
    aggs = []
    for f in sketches.schema.fields:
        n = f.name
        if n.endswith(" hll"):
            aggs.append(F.hll_union_agg(F.col(n)).alias(n))
        elif n.endswith(" min") or n.endswith(" minlen"):
            aggs.append(F.min(F.col(n)).alias(n))
        elif n.endswith(" max") or n.endswith(" maxlen") or n.endswith(" maxsize"):
            aggs.append(F.max(F.col(n)).alias(n))
        else:  # __n, nulls, sum, sumsq, lensum, sizesum
            aggs.append(F.sum(F.col(n)).alias(n))
    return sketches.agg(*aggs)


def render_profile(sketch: DataFrame) -> dict:
    """`profile_table`-shaped dict from a (possibly merged) sketch row:
    distinct via `hll_sketch_estimate`, mean = sum/n, std from the
    (sum, sumsq) moments (population → sample-corrected like stddev)."""
    import math

    cols = [
        F.hll_sketch_estimate(F.col(f.name)).alias(f.name)
        if f.name.endswith(" hll")
        else F.col(f.name)
        for f in sketch.schema.fields
    ]
    row = sketch.select(*cols).first().asDict()
    total = int(row["__n"] or 0)
    names = sorted(
        {k.rsplit(" ", 1)[0] for k in row if k != "__n" and " " in k}
    )
    out: dict = {"n_rows": total, "columns": {}}
    for n in names:
        nn = int(row.get(f"{n} nulls") or 0)
        stats = {
            "n_nulls": nn,
            "null_rate": nn / total if total else 0.0,
            "approx_distinct": int(row.get(f"{n} hll") or 0),
        }
        for suffix in ("min", "max", "minlen", "maxlen", "maxsize"):
            if f"{n} {suffix}" in row:
                v = row[f"{n} {suffix}"]
                stats[suffix] = v if not hasattr(v, "isoformat") else v.isoformat()
        cnt = total - nn
        if f"{n} sum" in row and cnt > 0:
            s, ss = float(row[f"{n} sum"] or 0), float(row[f"{n} sumsq"] or 0)
            stats["mean"] = s / cnt
            if cnt > 1:
                var = max(0.0, (ss - s * s / cnt) / (cnt - 1))
                stats["std"] = math.sqrt(var)
        if f"{n} lensum" in row and cnt > 0:
            stats["avglen"] = float(row[f"{n} lensum"] or 0) / cnt
        if f"{n} sizesum" in row and cnt > 0:
            stats["avgsize"] = float(row[f"{n} sizesum"] or 0) / cnt
        out["columns"][n] = stats
    return out

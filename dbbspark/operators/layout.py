"""Multi-dimensional data layout (Z-order clustering) — the write-side
twin of predicate pushdown (SURVEY.md §2.11 C41).

Parquet scans skip whole files / row groups whose column min-max stats
exclude the predicate (the same DPP/pushdown machinery the plan tests
pin). A single `sortWithinPartitions(x)` layout makes that skipping work
for filters on x and DESTROYS it for every other column — each file then
spans the full range of y. Interleaving the bits of several columns into
one sort key (Morton / Z-order, the technique behind Delta Lake's
OPTIMIZE ZORDER BY) bounds every file to a small hyper-rectangle, so
min-max skipping engages on ALL the interleaved columns at once. At
100 TB this is the difference between a point-lookup touching a handful
of files and touching all of them.

Everything is pure JVM expression math (shift/and/or chains — no UDF,
fuses into codegen):

- `zorder_col(ranges, bits)` builds the interleaved key from explicit
  (col, min, max) ranges — replayable, no data-dependent state.
- `add_zorder_key(df, cols)` computes the ranges with ONE bounded
  aggregate (2·k scalars on the driver) and attaches the key.
- `zorder_write(df, path, cols, n_files)` range-partitions on the key
  (sampled range exchange — no single reducer), sorts within each
  partition, drops the helper column and writes parquet.

Cost shape: one stats aggregate + one range shuffle of the data — the
same cost as any global sort, paid once at write time; every later scan
with a selective filter on any clustered column gets file skipping for
free. The key caps at 63 bits (bits·k ≤ 63), plenty for file-level
clustering: resolution beyond file count adds nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _scale_to_grid(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into the [0, 2^bits) integer grid. Constant
    columns (hi == lo) land on 0; out-of-range values clamp, so the key
    is total even on data drifting past the declared range."""
    cells = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(cells))
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells), scaled))


def zorder_col(
    ranges: list[tuple[Column | str, float, float]], bits: int = 12
) -> Column:
    """Morton-interleaved sort key from (column, min, max) triples: bit i
    of column j lands at position i·k + j, so the low bits of every
    column dominate together and key-adjacent rows are close in ALL
    dimensions. Pure shift/and/or expression chain — codegen-friendly,
    deterministic, replayable from the pinned ranges."""
    k = len(ranges)
    if k == 0:
        raise ValueError("need at least one column")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds the 63-bit key")
    parts = []
    for j, (c, lo, hi) in enumerate(ranges):
        col = F.col(c) if isinstance(c, str) else c
        g = _scale_to_grid(col, lo, hi, bits)
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(g, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_oracle_sql(
    ranges: list[tuple[str, float, float]], bits: int = 12
) -> str:
    """DuckDB SQL re-deriving `zorder_col` for the value-oracle fold
    (SURVEY C41, folded r12): the same scale-to-grid (floor of the
    double division/multiplication in the same order, so IEEE rounding
    agrees bit-for-bit) and the same bit interleave, written as an
    explicit shift/and/or chain the oracle engine evaluates
    independently. ``ranges`` are (column SQL, lo, hi) triples."""
    k = len(ranges)
    if k == 0:
        raise ValueError("need at least one column")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds the 63-bit key")
    parts = []
    for j, (c, lo, hi) in enumerate(ranges):
        cells = (1 << bits) - 1
        if hi <= lo:
            g = "CAST(0 AS BIGINT)"
        else:
            scaled = (
                f"CAST(floor((CAST({c} AS DOUBLE) - {float(lo)!r}) "
                f"/ {float(hi) - float(lo)!r} * {float(cells)!r}) AS BIGINT)"
            )
            g = f"greatest(CAST(0 AS BIGINT), least(CAST({cells} AS BIGINT), {scaled}))"
        for i in range(bits):
            parts.append(f"((({g} >> {i}) & 1) << {i * k + j})")
    return "(" + " | ".join(parts) + ")"


def add_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    key_col: str = "__zorder",
) -> DataFrame:
    """Attach the Z-order key, deriving each column's range with ONE
    aggregate (driver holds 2·k scalars — bounded by construction).
    Null values sort to grid cell 0 (coalesced to the column minimum) so
    they cluster together instead of poisoning the key."""
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    ranges = []
    for c in cols:
        lo = stats[f"lo_{c}"]
        hi = stats[f"hi_{c}"]
        lo = float(lo) if lo is not None else 0.0
        hi = float(hi) if hi is not None else 0.0
        ranges.append((F.coalesce(F.col(c), F.lit(lo)), lo, hi))
    return df.withColumn(key_col, zorder_col(ranges, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Cluster and write: range-partition on the interleaved key (Spark
    samples the key distribution — skew in the clustered columns becomes
    uneven key density, which the range exchange absorbs; never a single
    reducer), sort within each partition so row groups inside a file are
    tight too, drop the helper column, write parquet."""
    keyed = add_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode(mode)
        .parquet(path)
    )


def file_spans(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file (min, max) of each column — the exact stats a min-max
    skipping scan consults, surfaced as a relation for layout audits
    (one scan, one small aggregate; rows = #files)."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("__file").agg(*aggs)

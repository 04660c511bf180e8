"""Z-order layout (C41): the interleaved key matches a bit-level Python
reference, and the written layout actually delivers what it exists for —
min-max file skipping on EVERY clustered column, where a single-column
sort only delivers it on one."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dbbspark.operators.layout import (
    add_zorder_key,
    file_spans,
    zorder_col,
    zorder_write,
)


def _ref_interleave(vals: list[int], bits: int) -> int:
    out = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


def test_zorder_key_matches_bit_reference(spark):
    """Grid values on an identity range: the Spark expression chain must
    reproduce the classic Morton interleave exactly."""
    rng = random.Random(3)
    bits = 6
    cells = (1 << bits) - 1
    rows = [(rng.randint(0, cells), rng.randint(0, cells)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = (
        df.withColumn(
            "z", zorder_col([("x", 0, cells), ("y", 0, cells)], bits=bits)
        )
        .collect()
    )
    for r in got:
        assert r["z"] == _ref_interleave([r["x"], r["y"]], bits)


def test_zorder_key_handles_nulls_and_constants(spark):
    df = spark.createDataFrame(
        [(1, None), (5, None), (None, None)], "x int, y int"
    )
    out = add_zorder_key(df, ["x", "y"], bits=4)
    rows = out.collect()
    assert all(r["__zorder"] is not None for r in rows)
    # y is all-null => constant range => contributes 0 bits; null x
    # coalesces to the column min => cell 0 => key 0
    assert min(r["__zorder"] for r in rows) == 0


def test_zorder_layout_prunes_on_both_dims(spark, tmp_path):
    """Uniform 2-D data, 16 files. Z-ordered: a selective range filter on
    EITHER column overlaps only a minority of files. x-sorted: y-filters
    overlap every file. This is the min-max stat a skipping scan uses,
    read back per-file via file_spans."""
    rng = random.Random(11)
    n = 20000
    rows = [(rng.randint(0, 1_000_000), rng.randint(0, 1_000_000)) for _ in range(n)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsort")
    # 64 files => ~6 bits of shared z-prefix per file => an 8x8 spatial
    # grid; a 5%-wide slab on either axis covers ~1 grid column (+ the
    # blur of sample-based range boundaries)
    zorder_write(df, zpath, ["x", "y"], n_files=64, bits=10)
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def overlap_fraction(path: str, col: str, lo: int, hi: int) -> float:
        spans = file_spans(spark, path, ["x", "y"]).collect()
        total = len(spans)
        hit = sum(
            1 for r in spans if not (r[f"max_{col}"] < lo or r[f"min_{col}"] > hi)
        )
        return hit / total

    # 5%-wide range query inside one 8x8 grid cell (avoids the exact
    # 0.5 boundary so the ideal overlap is a single grid column)
    for col in ("x", "y"):
        frac = overlap_fraction(zpath, col, 510_000, 560_000)
        assert frac <= 0.45, f"z-order failed to bound {col}: {frac}"
    # the single-column layout prunes x but not y
    assert overlap_fraction(spath, "x", 510_000, 560_000) <= 0.25
    assert overlap_fraction(spath, "y", 510_000, 560_000) >= 0.9

    # layout is a pure reorder: same multiset of rows
    assert spark.read.parquet(zpath).count() == n
    assert (
        spark.read.parquet(zpath)
        .exceptAll(spark.read.parquet(spath))
        .count()
        == 0
    )


def test_zorder_write_respects_predicate_pushdown(spark, tmp_path):
    """The clustered files still serve pushed filters: the scan carries a
    PushedFilters entry for the clustered column."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 5000).alias("y")
    )
    path = str(tmp_path / "pushed")
    zorder_write(df, path, ["x", "y"], n_files=4, bits=8)
    plan = (
        spark.read.parquet(path)
        .filter(F.col("y") < 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(y), LessThan(y,100)" in plan


def test_zorder_oracle_sql_matches_zorder_col(spark):
    """C41 fold core (r12): the DuckDB re-derivation of the Morton key
    must equal zorder_col bit-for-bit, including the clamp legs (values
    past the declared range) and the constant-column (hi <= lo) case."""
    import duckdb
    from pyspark.sql import functions as F

    from dbbspark.operators.layout import zorder_col, zorder_oracle_sql

    rows = [(i, float(x)) for i, x in enumerate(
        [0, 1, 7.5, 99.9, 100, 250, -3, 1023, 512.25, 0.001]
    )]
    df = spark.createDataFrame(rows, "i long, v double")
    ranges = [(F.col("i"), 0, 9), (F.col("v"), 0, 100), (F.col("i"), 5, 5)]
    got = {
        (r["i"], r["z"]) for r in df.select(
            "i", zorder_col(ranges, bits=8).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v!r})" for i, v in rows)
        + ") AS t(i, v)"
    )
    sql = zorder_oracle_sql([("i", 0, 9), ("v", 0, 100), ("i", 5, 5)], bits=8)
    want = set(con.execute(f"SELECT i, {sql} FROM t").fetchall())
    assert got == want

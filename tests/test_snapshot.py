"""Corpus snapshot diff (operators/snapshot.py, SURVEY.md §2.11 C51)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.operators.snapshot import snapshot_diff


def _corpus(spark, lo, hi, extra_col=False):
    df = spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
    )
    if extra_col:
        df = df.withColumn("lang", F.lit("en"))
    return df


def test_unsaturated_diff_is_exact(spark):
    old = _corpus(spark, 0, 400)
    new = _corpus(spark, 100, 500)  # 300 shared, 100 removed, 100 added
    d = snapshot_diff(old, new, k=1024)
    assert d["rows_old"] == 400 and d["rows_new"] == 400 and d["row_delta"] == 0
    assert d["jaccard"] == 300 / 500
    assert abs(d["added_est"] - 100) < 1e-6
    assert abs(d["removed_est"] - 100) < 1e-6
    assert abs(d["survived_frac"] - 300 / 400) < 1e-9
    assert abs(d["novel_frac"] - 100 / 400) < 1e-9


def test_identical_snapshots_clean(spark):
    c = _corpus(spark, 0, 200)
    d = snapshot_diff(c, c)
    assert d["jaccard"] == 1.0 and d["added_est"] == 0.0
    assert d["removed_est"] == 0.0 and d["drift"] == []


def test_drift_surfaces_schema_change(spark):
    old = _corpus(spark, 0, 100)
    new = _corpus(spark, 0, 100, extra_col=True)
    d = snapshot_diff(old, new)
    assert {"column": "lang", "kind": "appeared"} in d["drift"]


def test_portable_hash_and_no_drift_mode_match_default_numbers(spark):
    """The r13 fold mode (portable md5 sketch hash + include_drift=False)
    must report the same exact overlap numbers as the default on
    unsaturated sketches (both are the full hash sets), with the two
    profile passes skipped (drift None)."""
    old = _corpus(spark, 0, 400)
    new = _corpus(spark, 100, 500)
    a = snapshot_diff(old, new, k=1024)
    b = snapshot_diff(
        old, new, k=1024, portable_hash=True, include_drift=False
    )
    assert b["drift"] is None
    for key in ("rows_old", "rows_new", "row_delta", "jaccard",
                "survived_frac", "novel_frac", "added_est", "removed_est"):
        assert abs(a[key] - b[key]) < 1e-9, key

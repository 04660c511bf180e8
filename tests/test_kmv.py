"""KMV bottom-k sketches / corpus overlap (operators/sketches.py C44)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.operators.sketches import (
    corpus_overlap,
    kmv_cardinality,
    kmv_merge,
    kmv_sketch,
)


def _keys(spark, lo, hi, tag=""):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("key")
    )


def test_unsaturated_is_exact(spark):
    a = _keys(spark, 0, 300)  # 0..299
    b = _keys(spark, 200, 500)  # 200..499, overlap 100, union 500
    sa, sb = kmv_sketch(a, "key", k=1024), kmv_sketch(b, "key", k=1024)
    ov = corpus_overlap(sa, sb, k=1024)
    assert ov["jaccard"] == 100 / 500
    assert ov["card_a"] == 300.0 and ov["card_b"] == 300.0
    assert ov["containment_b_in_a"] == 100 / 300


def test_saturated_estimates_within_bound(spark):
    n, k = 20_000, 512
    a = _keys(spark, 0, n)
    b = _keys(spark, n // 2, n + n // 2)  # 50% of each shared, J = 1/3
    ov = corpus_overlap(kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k), k=k)
    assert abs(ov["jaccard"] - 1 / 3) < 0.07  # ~1/sqrt(512) + slack
    assert abs(ov["card_a"] - n) / n < 0.15
    assert abs(ov["containment_b_in_a"] - 0.5) < 0.12


def test_disjoint_and_identical(spark):
    a = _keys(spark, 0, 5000, "a")
    b = _keys(spark, 0, 5000, "b")
    k = 256
    ov = corpus_overlap(kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k), k=k)
    assert ov["jaccard"] == 0.0
    same = corpus_overlap(kmv_sketch(a, "key", k=k), kmv_sketch(a, "key", k=k), k=k)
    assert same["jaccard"] == 1.0 and abs(same["containment_a_in_b"] - 1.0) < 1e-9


def test_merge_equals_one_shot(spark):
    k = 128
    a, b = _keys(spark, 0, 4000), _keys(spark, 3000, 7000)
    merged = kmv_merge(kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k), k=k)
    one_shot = kmv_sketch(a.unionByName(b), "key", k=k)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in one_shot.collect()
    )


def test_null_keys_skipped(spark):
    df = spark.createDataFrame([("x",), (None,), ("y",)], "key string")
    assert kmv_sketch(df, "key", k=16).count() == 2


def test_cardinality_estimator_unsaturated_exact():
    assert kmv_cardinality([1, 2, 3], 16) == 3.0


def test_merge_associative_three_ways(spark):
    k = 64
    a, b, c = _keys(spark, 0, 2000), _keys(spark, 1500, 3500), _keys(spark, 3000, 5000)
    sa, sb, sc = (kmv_sketch(x, "key", k=k) for x in (a, b, c))
    left = kmv_merge(kmv_merge(sa, sb, k=k), sc, k=k)
    right = kmv_merge(sa, kmv_merge(sb, sc, k=k), k=k)
    one_shot = kmv_sketch(a.unionByName(b).unionByName(c), "key", k=k)
    la = sorted(r["h"] for r in left.collect())
    ra = sorted(r["h"] for r in right.collect())
    oa = sorted(r["h"] for r in one_shot.collect())
    assert la == ra == oa

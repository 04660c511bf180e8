"""Epoch repeat-factor materialization (operators/mixing.py C52) and
curriculum ordering (operators/curriculum.py C53)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.curriculum import curriculum_order, curriculum_stages
from dbbspark.operators.mixing import epoch_repeats


def _docs(spark, n=600):
    rows = [
        (i, ["web", "code", "books"][i % 3], f"text {i}") for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_integer_repeats_exact(spark):
    d = _docs(spark)
    out = epoch_repeats(d, {"web": 2.0, "code": 1.0, "books": 0.0})
    by = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by == {"web": 400, "code": 200}  # books dropped, web doubled
    # every (doc, rep) pair unique; web docs carry reps {0, 1}
    assert out.select("doc_id", "rep").distinct().count() == out.count()
    web_reps = {
        r["rep"] for r in out.where("source = 'web'").select("rep").collect()
    }
    assert web_reps == {0, 1}


def test_fractional_repeats_rate_and_determinism(spark):
    d = _docs(spark, 900)
    out = epoch_repeats(d, {"web": 1.5, "code": 1.5, "books": 1.5})
    n = out.count()
    assert abs(n - 1350) / 1350 < 0.08  # md5 gate ≈ frac rate
    # deterministic across partitionings
    a = sorted(
        (r["doc_id"], r["rep"]) for r in out.collect()
    )
    b = sorted(
        (r["doc_id"], r["rep"])
        for r in epoch_repeats(
            d.repartition(13), {"web": 1.5, "code": 1.5, "books": 1.5}
        ).collect()
    )
    assert a == b
    # a different epoch seed redraws the FRACTIONAL copies only
    c = sorted(
        (r["doc_id"], r["rep"])
        for r in epoch_repeats(
            d, {"web": 1.5, "code": 1.5, "books": 1.5}, epoch_seed=1
        ).collect()
    )
    assert c != a
    full_a = {(i, r) for i, r in a if r == 0}
    full_c = {(i, r) for i, r in c if r == 0}
    assert full_a == full_c  # integer part identical across epochs


def test_repeats_validation(spark):
    with pytest.raises(ValueError):
        epoch_repeats(_docs(spark), {"web": -1.0})


def test_curriculum_bands_monotone_and_replayable(spark):
    rows = [(i, float(i % 100)) for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id long, score double")
    staged, cuts = curriculum_stages(d, "score", stages=4)
    assert len(cuts) == 3 and cuts == sorted(cuts)
    got = staged.collect()
    # stage = number of cuts strictly below the score: every doc sits
    # inside its band's (cut, cut] interval
    for r in got:
        if r["stage"] > 0:
            assert r["score"] > cuts[r["stage"] - 1]
        if r["stage"] < 3:
            assert r["score"] <= cuts[r["stage"]]
    # pinned-cut replay: identical bands from the returned cuts
    again, _ = curriculum_stages(d.repartition(7), "score", stages=4, cuts=cuts)
    assert sorted((r["doc_id"], r["stage"]) for r in got) == sorted(
        (r["doc_id"], r["stage"]) for r in again.collect()
    )


def test_curriculum_order_deterministic_and_band_sequential(spark):
    rows = [(i, float((i * 37) % 50)) for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, score double")
    out = curriculum_order(d, "score", stages=3, seed=5, num_partitions=4)
    seq = [(r["stage"], r["order_key"], r["doc_id"]) for r in out.toLocalIterator()]
    # global order: stages appear in nondecreasing order end-to-end
    assert seq == sorted(seq)
    # deterministic across partitionings
    out2 = curriculum_order(
        d.repartition(11), "score", stages=3, seed=5, num_partitions=4
    )
    assert seq == [
        (r["stage"], r["order_key"], r["doc_id"]) for r in out2.toLocalIterator()
    ]
    # a different seed reorders WITHIN bands but not the band schedule
    out3 = curriculum_order(d, "score", stages=3, seed=6, num_partitions=4)
    seq3 = [(r["stage"], r["doc_id"]) for r in out3.toLocalIterator()]
    assert [s for s, _ in seq3] == [s for s, _, _ in seq]
    assert seq3 != [(s, i) for s, _, i in seq]


def test_curriculum_no_global_single_partition_sort(spark):
    """The materialized order is a range exchange, never a single-task
    global sort (the scale contract)."""
    rows = [(i, float(i % 10)) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, score double")
    plan = (
        curriculum_order(d, "score", stages=2, num_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_default_wildcard_rate(spark):
    d = _docs(spark, 300)
    out = epoch_repeats(d, {"web": 2.0}, default=1.0)
    by = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by == {"web": 200, "code": 100, "books": 100}

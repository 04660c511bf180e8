"""Dataset-mixing operator: rate math, proportion accuracy of the hash
gate, determinism, and the pushdown plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dbbspark.operators.mixing import mix_sources, mixture_rates


def test_mixture_rates_most_constrained_source_caps_corpus():
    # web is huge, code is scarce: a 50/50 mix is capped by code's size
    rates = mixture_rates({"web": 1_000_000, "code": 10_000}, {"web": 0.5, "code": 0.5})
    assert rates["code"] == 1.0  # fully used
    assert rates["web"] == pytest.approx(0.01)  # 10k of 1M


def test_mixture_rates_validation():
    with pytest.raises(ValueError, match="unknown sources"):
        mixture_rates({"a": 10}, {"b": 1.0})


def _sources(spark):
    big = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"), F.lit("w").alias("text")
    )
    small = spark.range(100_000, 105_000).select(
        F.col("id").alias("doc_id"), F.lit("c").alias("text")
    )
    return {"web": big, "code": small}


def test_mix_hits_proportions(spark):
    mixed = mix_sources(_sources(spark), {"web": 0.6, "code": 0.4}, "doc_id")
    counts = {r["mix_source"]: r["n"] for r in mixed.groupBy("mix_source").agg(F.count("*").alias("n")).collect()}
    # corpus = min(20000/0.6, 5000/0.4) = 12500 → web 7500, code 5000 (full)
    assert counts["code"] == 5000
    assert counts["web"] == pytest.approx(7500, rel=0.05)  # hash-gate noise
    ratio = counts["web"] / (counts["web"] + counts["code"])
    assert ratio == pytest.approx(0.6, abs=0.02)


def test_mix_is_deterministic(spark):
    a = mix_sources(_sources(spark), {"web": 0.3, "code": 0.7}, "doc_id")
    b = mix_sources(_sources(spark), {"web": 0.3, "code": 0.7}, "doc_id")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_mix_gate_is_pushdown_shaped(spark, sf_dir):
    """Against a real parquet source the gate must be a scan-side filter,
    not a post-shuffle one: no Exchange anywhere in the mixed plan."""
    from dbbspark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_sources(
        {"a": docs, "b": docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)},
        {"a": 0.5, "b": 0.5},
        "doc_id",
    )
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "mixing must be filter+union only"

"""Curation funnel audit (operators/funnel.py, SURVEY.md §2.11 C45)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.operators.funnel import SURVIVED, funnel_audit, funnel_blame


def _docs(spark):
    rows = [
        (1, "short", 1),
        (2, "a perfectly fine document with enough tokens", 7),
        (3, "duplicate text here", 3),
        (4, "duplicate text here", 3),  # exact dup of 3
        (5, "xxx xxx xxx xxx xxx xxx", 6),  # repetitive → quality drop
        (6, "another good document that survives every gate", 7),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_tokens bigint")


def _stages(spark):
    dup_ids = spark.createDataFrame([(4,)], "doc_id long")  # keep-first drop
    return [
        ("min_tokens", F.col("n_tokens") < 5),
        ("exact_dedup", dup_ids),
        ("repetition", F.size(F.array_distinct(F.split("text", " "))) == 1),
    ]


def test_first_drop_attribution(spark):
    got = {
        r["doc_id"]: r["first_drop"]
        for r in funnel_blame(_docs(spark), _stages(spark)).collect()
    }
    assert got == {
        1: "min_tokens",
        2: SURVIVED,
        3: "min_tokens",  # 3 tokens — earlier stage wins the blame
        4: "min_tokens",  # also in dup_ids, but min_tokens fires first
        5: "repetition",
        6: SURVIVED,
    }


def test_summary_waterfall(spark):
    _, summary = funnel_audit(
        _docs(spark), _stages(spark), token_col="n_tokens"
    )
    by_stage = {s["stage"]: s for s in summary}
    assert by_stage["min_tokens"]["reached"] == 6
    assert by_stage["min_tokens"]["dropped"] == 3
    assert by_stage["exact_dedup"]["reached"] == 3
    assert by_stage["exact_dedup"]["dropped"] == 0  # blame taken upstream
    assert by_stage["repetition"]["dropped"] == 1
    assert by_stage["repetition"]["survived_after"] == 2
    assert by_stage["min_tokens"]["tokens_dropped"] == 1 + 3 + 3


def test_blame_columns_clean(spark):
    blamed = funnel_blame(_docs(spark), _stages(spark))
    assert not [c for c in blamed.columns if c.startswith("_hit_")]
    assert "first_drop" in blamed.columns


def test_matches_sequential_pipeline(spark):
    """The audit's survivors == actually running the chain stage by stage."""
    docs = _docs(spark)
    stages = _stages(spark)
    from pyspark.sql import DataFrame

    seq = docs
    for name, spec in stages:
        if isinstance(spec, DataFrame):
            seq = seq.join(spec, "doc_id", "left_anti")
        else:
            seq = seq.where(~spec)
    expect = sorted(r["doc_id"] for r in seq.collect())
    blamed = funnel_blame(docs, stages)
    got = sorted(
        r["doc_id"] for r in blamed.where(F.col("first_drop") == SURVIVED).collect()
    )
    assert got == expect


def test_empty_and_all_survive(spark):
    docs = _docs(spark)
    _, summary = funnel_audit(docs, [("nothing", F.lit(False))])
    assert summary[0]["dropped"] == 0 and summary[0]["survived_after"] == 6
    empty = docs.where(F.lit(False))
    _, s2 = funnel_audit(empty, [("nothing", F.lit(False))])
    assert s2[0]["reached"] == 0 and s2[0]["drop_rate"] == 0.0

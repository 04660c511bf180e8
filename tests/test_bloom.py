"""Broadcast Bloom pre-filter (operators/bloom.py): no false negatives,
bounded false positives, JVM-only probe plan, and gate results that are
byte-identical with and without it (C34)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.bloom import (
    build_bloom,
    might_contain,
    split_by_bloom,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


@pytest.fixture(scope="module")
def table(keys):
    return build_bloom(keys, "k", num_bits=1 << 16)


def test_no_false_negatives(spark, keys, table):
    tagged = might_contain(keys, table, "k")
    assert tagged.where(~F.col("maybe_known")).count() == 0


def test_false_positive_rate_bounded(spark, table):
    fresh = spark.range(0, 2000).select(
        F.concat(F.lit("unseen-"), F.col("id")).alias("k")
    )
    fp = might_contain(fresh, table, "k").where(F.col("maybe_known")).count()
    # 2000 keys in 2^16 bits, k=5 → theoretical fpp ≈ 0.2%; allow 10×.
    assert fp <= 40


def test_split_routes_null_to_new(spark, table):
    df = spark.createDataFrame([("key-1",), (None,)], "k string")
    maybe, new = split_by_bloom(df, table, "k")
    assert [r["k"] for r in maybe.collect()] == ["key-1"]
    assert [r["k"] for r in new.collect()] == [None]


def test_probe_is_jvm_only(keys, table):
    """The membership test must stay in whole-stage codegen: no Python
    evaluation, the only join a broadcast of the one-row word table."""
    plan = might_contain(keys, table, "k")._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_union_of_tables_covers_both(spark, keys, table):
    more = spark.range(0, 100).select(
        F.concat(F.lit("extra-"), F.col("id")).alias("k")
    )
    t2 = build_bloom(more, "k", num_bits=1 << 16)
    merged = [a | b for a, b in zip(table, t2)]
    both = keys.unionByName(more)
    assert might_contain(both, merged, "k").where(~F.col("maybe_known")).count() == 0


def test_build_validation(keys):
    with pytest.raises(ValueError):
        build_bloom(keys, "k", num_bits=0)
    with pytest.raises(ValueError):
        build_bloom(keys, "k", num_hashes=0)


# ---------------------------------------------------------------------------
# Gate integration: identical answers with and without the pre-filter.

BOILER = "subscribe to our newsletter"


def _gate_pair(spark, with_bloom):
    from dbbspark.streaming.linededup import gate_batch

    # Build a real prior index from a seed batch so hashes line up.
    seed = spark.createDataFrame(
        [(100, f"{BOILER}\nseed body")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "h bigint, df bigint")
    _, prior = gate_batch(seed, empty)
    prior = prior.cache()
    batch = spark.createDataFrame(
        [
            (1, f"{BOILER}\nfirst body"),
            (2, "second body\nunique line"),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    bloom = build_bloom(prior.select("h"), "h", num_bits=1 << 16) if with_bloom else None
    deduped, updated = gate_batch(batch, prior, index_bloom=bloom)
    return (
        sorted((r["doc_id"], r["text"]) for r in deduped.collect()),
        sorted((r["h"], r["df"]) for r in updated.collect()),
    )


def test_gate_identical_with_and_without_bloom(spark):
    assert _gate_pair(spark, True) == _gate_pair(spark, False)


def test_neardedup_gate_identical_with_and_without_bloom(spark):
    """The LSH candidate join pre-filter must not change accept/reject
    decisions — only skip provably-collision-free band rows."""
    from dbbspark.operators.dedup import _band_signatures, minhash_signatures
    from dbbspark.streaming.neardedup import gate_batch

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    corpus_sigs = minhash_signatures(corpus, "doc_id", "text", 16, 3).cache()
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "an entirely different document about distributed execution"),
        ],
        "doc_id long, text string",
    )
    bloom = build_bloom(
        _band_signatures(corpus_sigs, 4, 4).select(
            F.xxhash64("band", "sig").alias("bk")
        ).distinct(),
        "bk",
        num_bits=1 << 16,
    )

    def run(b):
        acc, sigs = gate_batch(batch, corpus_sigs, index_bloom=b)
        return sorted(r["doc_id"] for r in acc.collect())

    assert run(None) == run(bloom) == [2]


def test_neardedup_streaming_bloom_across_batches(spark, tmp_path):
    """use_bloom end to end on the near-dedup gate: duplicates of
    earlier batches still rejected, bloom persisted in the sibling dir
    (never inside the partition-discovered index root)."""
    import os

    from dbbspark.streaming.linededup import load_bloom
    from dbbspark.streaming.neardedup import process_batch

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "an entirely different document about distributed execution"
    b1 = spark.createDataFrame([(1, text_a)], "doc_id long, text string")
    process_batch(b1, 0, idx, acc, use_bloom=True)
    assert load_bloom(spark, idx) is not None
    assert not os.path.exists(os.path.join(idx, "bloom"))
    b2 = spark.createDataFrame(
        [(2, text_a), (3, text_b)], "doc_id long, text string"
    )
    process_batch(b2, 1, idx, acc, use_bloom=True)
    got = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    assert got == [1, 3]  # 2 rejected as a dup of batch-0's doc 1
    # retry resolves predecessor bloom; results unchanged
    process_batch(b2, 1, idx, acc, use_bloom=True)
    assert sorted(r["doc_id"] for r in spark.read.parquet(acc).collect()) == [1, 3]


def test_streaming_gate_with_bloom_across_batches(spark, tmp_path):
    """use_bloom=True end to end: the persisted filter is maintained
    incrementally and the cross-batch cumulative-df rule still holds."""
    from dbbspark.streaming.linededup import load_bloom, process_batch

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    b1 = spark.createDataFrame(
        [(1, f"{BOILER}\nbody one"), (2, f"{BOILER}\nbody two")],
        "doc_id long, text string",
    )
    process_batch(b1, 0, idx, out, use_bloom=True)
    assert load_bloom(spark, idx) is not None
    b2 = spark.createDataFrame(
        [(3, f"{BOILER}\nbody three")], "doc_id long, text string"
    )
    process_batch(b2, 1, idx, out, use_bloom=True)
    got = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    }
    # boiler hit min_df in batch 1 (in-batch repeat) and stays cut in b2
    assert got == {1: "body one", 2: "body two", 3: "body three"}
    # retry of batch 1 must resolve the PREDECESSOR bloom, not its own
    assert load_bloom(spark, idx, before=1) is not None
    process_batch(b2, 1, idx, out, use_bloom=True)
    assert {
        r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()
    } == got

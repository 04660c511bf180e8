"""Sequence-packing operator: the distributed prefix sum must be exact
and bucketing-invariant, and the packing semantics (concat-and-chunk,
straddling allowed) must hold at the edges."""

from __future__ import annotations

from dbbspark.operators.packing import pack_sequences


def _pack(spark, rows, budget, num_buckets):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens bigint")
    out = pack_sequences(df, "doc_id", "n_tokens", budget, num_buckets)
    return {r["doc_id"]: (r["seq_first"], r["seq_last"], r["seq_offset"]) for r in out.collect()}


def test_packing_semantics(spark):
    # budget 10: doc0 fills [0,7), doc1 straddles seqs 0-1, doc2 sits in 1
    rows = [(0, 7), (1, 8), (2, 5)]
    got = _pack(spark, rows, budget=10, num_buckets=3)
    assert got[0] == (0, 0, 0)
    assert got[1] == (0, 1, 7)  # starts at token 7, ends at 14 → seqs 0..1
    assert got[2] == (1, 1, 5)  # starts at token 15
    # exact budget boundary: a doc ending exactly at a cut does NOT enter
    # the next sequence
    got = _pack(spark, [(0, 10), (1, 10)], budget=10, num_buckets=2)
    assert got[0] == (0, 0, 0)
    assert got[1] == (1, 1, 0)


def test_packing_bucket_invariance(spark):
    """num_buckets is a parallelism knob, never a semantics knob: any
    bucketing yields the identical global prefix sum."""
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    base = _pack(spark, rows, budget=256, num_buckets=1)
    for b in (3, 16, 64):
        assert _pack(spark, rows, budget=256, num_buckets=b) == base


def test_packing_no_unpartitioned_window(spark):
    """The scale contract: no Window over an empty partition spec (the
    single-task global-sort shape) anywhere in the plan."""
    df = spark.createDataFrame(
        [(i, i % 50 + 1) for i in range(100)], "doc_id long, n_tokens bigint"
    )
    plan = (
        pack_sequences(df, "doc_id", "n_tokens", 128, 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan

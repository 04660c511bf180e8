"""Streaming near-dedup gate (streaming/neardedup.py): a rolling corpus
ingested in two micro-batches must accept each near-dup cluster's first
arrival and reject later arrivals — across batch boundaries via the
persisted signature index."""

from __future__ import annotations

from dbbspark.streaming.neardedup import gate_batch, streaming_near_dedup

BANK = "the quick brown fox jumps over the lazy dog near the river bank"
BEND = "the quick brown fox jumps over the lazy dog near the river bend"
BARN = "the quick brown fox jumps over the lazy dog near the river barn"
SPARK = "spark shuffles partitions across executors during wide transformations"
PARQUET = "completely different text about parquet column pruning and codegen"


def _stream(spark, src):
    return spark.readStream.schema("doc_id long, text string").parquet(str(src))


def _drop(spark, src, rows, name):
    """Land one parquet FILE in the stream root (the file source does
    not recurse into the directory a DataFrame write would create)."""
    import glob
    import os
    import shutil

    stage = f"{src}_{name}_stage"
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(stage)
    os.makedirs(src, exist_ok=True)
    shutil.move(
        glob.glob(f"{stage}/part-*.parquet")[0], os.path.join(str(src), f"{name}.parquet")
    )
    shutil.rmtree(stage)


def _run(spark, src, tmp):
    q = streaming_near_dedup(
        _stream(spark, src),
        str(tmp / "idx"),
        str(tmp / "accepted"),
        str(tmp / "ck"),
    )
    q.awaitTermination()


def test_gate_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: 1 and 2 are near-dups → keep 1; 3 distinct
    _drop(spark, src, [(1, BANK), (2, BEND), (3, SPARK)], "b1")
    _run(spark, src, tmp_path)
    got1 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    assert got1 == {1, 3}

    # batch 2: 4 collides with the INDEXED doc 1 → rejected; 5 fresh
    _drop(spark, src, [(4, BARN), (5, PARQUET)], "b2")
    _run(spark, src, tmp_path)
    got2 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    assert got2 == {1, 3, 5}

    # index holds signatures for exactly the accepted docs
    idx = spark.read.parquet(str(tmp_path / "idx"))
    assert {r["doc"] for r in idx.select("doc").distinct().collect()} == {1, 3, 5}
    assert idx.count() == 3 * 16


def test_streaming_equals_direct_batch(spark, tmp_path):
    batch = spark.createDataFrame(
        [(1, BANK), (2, BEND), (3, SPARK)], ["doc_id", "text"]
    )
    empty_idx = spark.createDataFrame([], "doc long, perm bigint, minhash bigint")
    accepted, sigs = gate_batch(batch, empty_idx)
    assert {r["doc_id"] for r in accepted.collect()} == {1, 3}
    assert sigs.count() == 2 * 16

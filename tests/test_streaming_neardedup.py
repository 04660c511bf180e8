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


def test_retry_is_idempotent(spark, tmp_path):
    """Re-running the same batch_id (foreachBatch at-least-once retry)
    must neither duplicate accepted docs/signatures nor reject the batch
    against its own crashed attempt's index rows."""
    from dbbspark.streaming.neardedup import process_batch

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame([(1, BANK), (2, BEND), (3, SPARK)], ["doc_id", "text"])
    process_batch(b1, 0, idx, acc)
    b2 = spark.createDataFrame([(4, BARN), (5, PARQUET)], ["doc_id", "text"])
    process_batch(b2, 1, idx, acc)
    docs_once = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    sigs_once = sorted(
        (r["doc"], r["perm"], r["minhash"])
        for r in spark.read.parquet(idx).collect()
    )
    assert docs_once == [1, 3, 5]
    # retry batch 1: its own signatures are already in the index — the
    # gate must not collide docs 4/5 with themselves
    process_batch(b2, 1, idx, acc)
    process_batch(b2, 1, idx, acc)
    assert sorted(r["doc_id"] for r in spark.read.parquet(acc).collect()) == docs_once
    assert sorted(
        (r["doc"], r["perm"], r["minhash"])
        for r in spark.read.parquet(idx).collect()
    ) == sigs_once


def test_index_compaction_preserves_gate(spark, tmp_path):
    """maintenance.compact_gate_index: file count collapses, the gate's
    decisions and the index contents are identical afterwards."""
    import glob

    from dbbspark.maintenance import compact_gate_index
    from dbbspark.streaming.neardedup import gate_batch, process_batch

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    batches = [
        [(1, BANK), (2, BEND), (3, SPARK)],
        [(4, BARN), (5, PARQUET)],
        [(6, "totally fresh sentence about columnar vectorized execution")],
    ]
    for i, rows in enumerate(batches):
        process_batch(
            spark.createDataFrame(rows, ["doc_id", "text"]), i, idx, acc
        )
    pre_files = glob.glob(f"{idx}/**/*.parquet", recursive=True)
    pre_rows = sorted(
        (r["doc"], r["perm"], r["minhash"])
        for r in spark.read.parquet(idx).collect()
    )
    probe = spark.createDataFrame(
        [(7, BANK), (8, "another unseen sentence regarding shuffle hash joins")],
        ["doc_id", "text"],
    )
    def decide():
        accepted, _ = gate_batch(
            probe, spark.read.parquet(idx).select("doc", "perm", "minhash")
        )
        return sorted(r["doc_id"] for r in accepted.collect())

    pre_decision = decide()
    backup = compact_gate_index(spark, idx)
    post_files = glob.glob(f"{idx}/**/*.parquet", recursive=True)
    assert len(post_files) < len(pre_files) and len(post_files) == 1
    assert sorted(
        (r["doc"], r["perm"], r["minhash"])
        for r in spark.read.parquet(idx).collect()
    ) == pre_rows
    assert decide() == pre_decision
    # a post-compaction batch still lands its own partition
    process_batch(probe, 3, idx, acc)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(acc).collect()
    ) == [1, 3, 5, 6, 8]
    import shutil

    shutil.rmtree(backup)


def test_streaming_equals_direct_batch(spark, tmp_path):
    batch = spark.createDataFrame(
        [(1, BANK), (2, BEND), (3, SPARK)], ["doc_id", "text"]
    )
    empty_idx = spark.createDataFrame([], "doc long, perm bigint, minhash bigint")
    accepted, sigs = gate_batch(batch, empty_idx)
    assert {r["doc_id"] for r in accepted.collect()} == {1, 3}
    assert sigs.count() == 2 * 16


def test_bloom_enabled_mid_stream_covers_prior_corpus(spark, tmp_path):
    """ADVICE r9: turning use_bloom on over an index with pre-flag
    batches must save a filter covering the FULL signature index, not
    the enabling batch — else later batches silently accept near-dups
    of the pre-flag corpus."""
    from dbbspark.streaming.neardedup import process_batch

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    # batch 0 (bloom off): BANK accepted and indexed
    process_batch(
        spark.createDataFrame([(1, BANK)], ["doc_id", "text"]),
        0, idx, acc, use_bloom=False,
    )
    # batch 1: bloom turns ON with an unrelated doc (prior filter None)
    process_batch(
        spark.createDataFrame([(2, SPARK)], ["doc_id", "text"]),
        1, idx, acc, use_bloom=True,
    )
    # batch 2: a near-dup of the PRE-FLAG doc 1 — must reject
    process_batch(
        spark.createDataFrame([(3, BEND)], ["doc_id", "text"]),
        2, idx, acc, use_bloom=True,
    )
    assert {
        r["doc_id"] for r in spark.read.parquet(acc).collect()
    } == {1, 2}


def test_gate_batch_banded_index_identical(spark, tmp_path):
    """gate_batch over the materialized banded bucketed signature index
    must decide exactly as over the flat (doc, perm, minhash) index —
    the corpus-scale read layout that skips the per-trigger corpus
    banding groupBy."""
    from dbbspark.maintenance import materialize_banded_sig_index
    from dbbspark.streaming.neardedup import _index_signatures, process_batch

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    process_batch(
        spark.createDataFrame([(1, BANK), (3, SPARK)], ["doc_id", "text"]),
        0, idx, acc,
    )
    batch = spark.createDataFrame([(4, BARN), (5, PARQUET)], ["doc_id", "text"])
    flat, _ = gate_batch(batch, _index_signatures(spark, idx))
    flat_ids = {r["doc_id"] for r in flat.collect()}
    try:
        n = materialize_banded_sig_index(spark, idx, "t_sig_banded")
        assert n == 2 * 4  # 2 docs x 4 bands
        banded, _ = gate_batch(
            batch, spark.table("t_sig_banded"), index_banded=True
        )
        banded_ids = {r["doc_id"] for r in banded.collect()}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sig_banded")
    assert flat_ids == banded_ids == {5}  # BARN rejects vs indexed BANK

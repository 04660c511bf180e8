"""Streaming ≡ batch equivalence for the stateful layer (SURVEY.md §2.9).

Structured Streaming's contract is that a watermarked streaming query
drained with availableNow produces the same result as the batch query
over the same data — these tests pin exactly that, plus bounded-state
dedup and the custom applyInPandasWithState operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.streaming.stateful import (
    dedup_within_watermark,
    run_to_memory,
    sequence_gap_monitor,
    stream_events,
    windowed_counts,
)
from dbbspark.tables import load_table


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    stream = windowed_counts(stream_events(spark, sf_dir))
    got = run_to_memory(
        stream, "wc_stream", str(tmp_path / "ck1"), output_mode="complete"
    )
    want = windowed_counts(load_table(spark, sf_dir, "events"))
    as_set = lambda df: {  # noqa: E731
        (r["window_start"], r["event_type"], r["cnt"], round(r["sum_value"], 6))
        for r in df.collect()
    }
    assert as_set(got) == as_set(want)


def test_dedup_within_watermark_stream(spark, sf_dir, tmp_path):
    # events keyed by event_type: many duplicates per key within the batch
    stream = dedup_within_watermark(
        stream_events(spark, sf_dir), keys=["event_type"]
    )
    got = run_to_memory(stream, "dd_stream", str(tmp_path / "ck2"))
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert got.count() == n_types


def test_sequence_gap_monitor(spark, sf_dir, tmp_path):
    stream = sequence_gap_monitor(stream_events(spark, sf_dir))
    got = run_to_memory(
        stream, "gap_stream", str(tmp_path / "ck3"), output_mode="update"
    )
    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy("user_id").agg(
        F.max("event_id").alias("batch_max"),
        (F.max("event_id") + 1).alias("expected_next"),
    )
    got_m = {r["user_id"]: (r["batch_max"], r["expected_next"]) for r in got.collect()}
    want_m = {
        r["user_id"]: (r["batch_max"], r["expected_next"]) for r in want.collect()
    }
    assert got_m == want_m
    # n_gaps: every non-consecutive ascending step is a gap
    rows = ev.select("user_id", "event_id").collect()
    seqs: dict[int, list[int]] = {}
    for r in rows:
        seqs.setdefault(r["user_id"], []).append(r["event_id"])
    expected_gaps = {
        u: sum(1 for a, b in zip(ids, ids[1:]) if b > a + 1)
        for u, ids in ((u, sorted(ids)) for u, ids in seqs.items())
    }
    got_gaps = {r["user_id"]: r["n_gaps"] for r in got.collect()}
    assert got_gaps == expected_gaps


def _doc_tokens(df):
    return df.select(
        (F.pmod(F.col("doc_id"), F.lit(4))).cast("long").alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )


def test_streaming_pack_one_batch_equals_batch(spark, sf_dir, tmp_path):
    from dbbspark.streaming.stateful import streaming_pack

    docs = load_table(spark, sf_dir, "documents")
    want = {
        r["doc_id"]: (r["shard"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in streaming_pack(_doc_tokens(docs), budget=256).collect()
    }
    src = str(tmp_path / "src")
    docs.select("doc_id", "text").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    got_df = run_to_memory(
        streaming_pack(_doc_tokens(stream), budget=256),
        "pack_stream",
        str(tmp_path / "ck_pack"),
        output_mode="update",
    )
    got = {
        r["doc_id"]: (r["shard"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in got_df.collect()
    }
    assert got == want and len(got) == docs.count()


def test_streaming_pack_state_carries_across_batches(spark, tmp_path):
    """Two micro-batches: the second batch's sequence ids must continue
    from the first batch's cumulative token count per shard."""
    import os
    import time

    from dbbspark.streaming.stateful import streaming_pack

    src = str(tmp_path / "src2")
    os.makedirs(src)
    # ids INTERLEAVE across batches: if both files collapsed into one
    # micro-batch, the id-sorted packing would differ — so this also
    # proves two batches actually ran
    rows1 = [(i, 1 + i % 7) for i in range(0, 80, 2)]
    rows2 = [(i, 1 + i % 5) for i in range(1, 81, 2)]
    spark.createDataFrame(rows1, "doc_id long, n_tokens long").coalesce(1).write.parquet(
        src + "/b1"
    )
    time.sleep(1.1)  # FileStreamSource orders files by mtime
    spark.createDataFrame(rows2, "doc_id long, n_tokens long").coalesce(1).write.parquet(
        src + "/b2"
    )
    stream = (
        spark.readStream.schema("doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    tagged = stream.select(
        F.pmod(F.col("doc_id"), F.lit(3)).cast("long").alias("shard"),
        "doc_id",
        "n_tokens",
    )
    got_df = run_to_memory(
        streaming_pack(tagged, budget=16),
        "pack_stream2",
        str(tmp_path / "ck_pack2"),
        output_mode="update",
    )
    got = {
        r["doc_id"]: (r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in got_df.collect()
    }

    # sequential reference: batch 1 docs then batch 2 docs, id order
    # within each batch, cum carried per shard
    cum = {}
    want = {}
    for batch in (rows1, rows2):
        for doc_id, n in sorted(batch):
            shard = doc_id % 3
            start = cum.get(shard, 0)
            end = start + n
            want[doc_id] = (start // 16, (end - 1) // 16, start % 16)
            cum[shard] = end
    assert got == want

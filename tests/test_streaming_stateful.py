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

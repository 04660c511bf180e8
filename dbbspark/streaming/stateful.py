"""Streaming analytics: watermarked windows, stateful dedup, custom state
(SURVEY.md §2.9 ST5-ST8, §2.10 U5).

The reference handles late data by recomputing the last 14 nites every
cron run (`bin/monitor_DBB_stagein.py:25,1147-1150`) and dedups against
the full registry (`bin/save_DBB_stagein_to_DBB.py:155-157`). The
Structured Streaming forms here replace recompute-the-window with
incremental maintenance:

- watermark + tumbling/nite window agg (ST5/ST6): state is bounded by the
  watermark horizon, late rows within it amend the right bucket;
- `dropDuplicatesWithinWatermark` (ST8): bounded-state dedup for the
  stream front-end (full-history dedup stays in the registry anti-join);
- `applyInPandasWithState` (U5): arbitrary per-key state — here a
  sequence-gap detector, the natural extension of the reference's
  seqnum bookkeeping (`bin/monitor_DBB_stagein.py:922-942`).

All entry points accept EITHER a streaming or a batch DataFrame (the
window expressions are identical); tests pin streaming(availableNow)
output == the batch equivalent, which is the exactly-once claim.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd  # module-level: lets typing.get_type_hints resolve the
# grouped-pandas callables' annotations (pyspark infers eval type from them)

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` fixture as a file stream (one availableNow batch in
    tests; a live directory feed in production). `ts` is normalized to
    TimestampType whichever way the fixture stored it — TIMESTAMP(NANOS)
    surfaces as long under nanosAsLong; naive micros surface as
    TIMESTAMP_NTZ (see tables._timestamp_columns)."""
    from ..session import apply_runtime_confs
    from ..tables import _timestamp_columns

    apply_runtime_confs(spark)
    schema = EVENTS_SCHEMA
    nanos_cols, naive_cols = _timestamp_columns(sf_dir, "events")
    nanos = "ts" in nanos_cols
    if nanos:
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in schema
            ]
        )
    elif "ts" in naive_cols:
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
                for f in schema
            ]
        )
    df = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif "ts" in naive_cols:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (ST5/ST6). On a
    stream, state for windows older than the watermark is dropped; the
    same expression works on a batch frame (watermark is a no-op there)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window_duration).alias("w"), "event_type"
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "cnt",
        "sum_value",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming dedup with bounded state (ST8): duplicates arriving
    within the watermark horizon are dropped; the registry anti-join
    (ingest J8) remains the full-history gate."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


GAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("batch_max", T.LongType()),
        T.StructField("expected_next", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
    ]
)

_GAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_expected", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
    ]
)


def sequence_gap_monitor(events: DataFrame) -> DataFrame:
    """Custom stateful operator (U5): per user, track the next expected
    event_id across micro-batches and count gaps — the streaming form of
    the reference's seqnum skip-marking. State is two longs per key."""

    def update(
        key: tuple,
        batches: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        (user_id,) = key
        next_expected, n_gaps = state.get if state.exists else (None, 0)
        batch_max = None
        for pdf in batches:
            ids = sorted(int(x) for x in pdf["event_id"])
            for i in ids:
                if next_expected is not None and i > next_expected:
                    n_gaps += 1
                if next_expected is None or i >= next_expected:
                    next_expected = i + 1
            if ids:
                batch_max = max(batch_max or 0, ids[-1])
        state.update((next_expected, n_gaps))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_max": [batch_max],
                "expected_next": [next_expected],
                "n_gaps": [n_gaps],
            }
        )

    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            GAP_OUTPUT_SCHEMA,
            _GAP_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("seq_first", T.LongType()),
        T.StructField("seq_last", T.LongType()),
        T.StructField("seq_offset", T.LongType()),
    ]
)

_PACK_STATE_SCHEMA = T.StructType([T.StructField("cum", T.LongType())])


def streaming_pack(
    docs: DataFrame,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Streaming sequence packing (U5 + the batch `pack_sequences`
    closure operator): documents arriving on a stream are laid end-to-end
    into fixed-`budget` training sequences, per shard, with the running
    token total carried across micro-batches as keyed state (one long).

    The batch operator's global order can't exist on a stream, so the
    packing order is (arrival batch, id within batch) per shard — the
    order any shard-parallel streaming tokenizer actually emits. Sequence
    ids are SHARD-LOCAL (shard s's sequences are s/0, s/1, ...); a global
    id is `shard * max_seqs + seq` downstream if needed. State never
    holds documents — just the cumulative token count, so a shard's state
    is 8 bytes regardless of stream length.

    Batch DataFrames take the same code path with zero initial state
    (`applyInPandas`), which pins streaming == batch on a one-batch drain
    (tests/test_streaming_stateful.py)."""
    import pandas as pd

    def _pack_frame(pdf: "pd.DataFrame", shard: int, cum: int):
        pdf = pdf.sort_values(id_col)
        c = pdf[token_col].astype("int64").cumsum() + cum
        start = c - pdf[token_col]
        out = pd.DataFrame(
            {
                "shard": shard,
                "doc_id": pdf[id_col].astype("int64"),
                "n_tokens": pdf[token_col].astype("int64"),
                "seq_first": start // budget,
                "seq_last": (c - 1) // budget,
                "seq_offset": start % budget,
            }
        )
        return out, (int(c.iloc[-1]) if len(c) else cum)

    sel = docs.select(
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(id_col),
        F.col(token_col),
    )

    if not docs.isStreaming:

        def batch_pack(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
            out, _ = _pack_frame(pdf, key[0], 0)
            return out

        return sel.groupBy(shard_col).applyInPandas(batch_pack, PACK_OUTPUT_SCHEMA)

    def update(
        key: tuple,
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (cum,) = state.get if state.exists else (0,)
        # the iterator yields Arrow CHUNKS of one group within one
        # micro-batch — concatenate before sorting so the batch-wide id
        # order holds across chunk boundaries
        chunks = [p for p in batches if not p.empty]
        if chunks:
            out, cum = _pack_frame(pd.concat(chunks), key[0], cum)
            yield out
        state.update((cum,))

    return sel.groupBy(shard_col).applyInPandasWithState(
        update,
        PACK_OUTPUT_SCHEMA,
        _PACK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    timeout_s: int = 120,
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table with
    availableNow (the cron-compatible trigger) and return it as a batch
    DataFrame. Test/report harness — production sinks are parquet tables
    via foreachBatch (see ingest.py).

    Output-mode notes: watermarked aggs under a single availableNow batch
    never finalize their newest windows, so `append` would suppress them —
    use `complete` (aggs) or `update` (stateful ops) to observe results.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return stream_df.sparkSession.table(name)

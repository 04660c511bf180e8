"""Streaming line-dedup gate — rolling-corpus boilerplate removal over a
persisted line-frequency index (composes §2.11 C26 with the §2.9
streaming surface; same stance as streaming/neardedup.py).

Batch CCNet line dedup (operators/lines.py) needs corpus-wide line
frequencies, which a rolling crawl never has all at once. The gate keeps
a persisted (h, df) index — one row per distinct normalized line ever
seen, the compact state — and per micro-batch:

1. explodes the batch into line mentions with normalized-line hashes
   (`line_mentions` — map-side);
2. folds the batch's own per-hash counts into the index counts: a line
   is boilerplate once its cumulative df (index + batch) reaches
   ``min_df``, so a banner repeated 100× inside ONE batch is caught
   immediately, not on the next batch;
3. emits the batch's documents with boilerplate lines removed, THEN
   merges the updated counts into the index — docs-first/index-last
   crash ordering: a crash between the writes can at most under-count
   df on retry (re-admitting a boilerplate line), never lose an output
   document.

The cumulative-df rule makes the stream STRICTER over time, matching
what a batch run over the full corpus would remove once every line's
true df is visible. Early batches may emit lines whose df only later
crosses the threshold — the inherent prefix-knowledge gap of any
one-pass gate; re-running batch `dedup_lines` over the accumulated
output closes it exactly, and `index_df` exposes the index so reports
can quantify the gap.

The index is one row per distinct normalized line, far smaller than the
corpus; the merge reads + rewrites it per batch (availableNow cadence).
At crawl scale, partition the index dir by a hash prefix of ``h`` and
rewrite only the partitions the batch touches (the same device as
operators.bucketing for the registry).

Crash/retry semantics (foreachBatch is at-least-once — a crash after a
side-effect but before the checkpoint commit re-runs the batch with the
SAME batch_id):

- documents land in ``out_dir/batch=<batch_id>`` via dynamic-partition
  overwrite, so a retried batch replaces exactly its own partition —
  output is idempotent, never appended twice;
- the index is a VERSIONED full snapshot ``index_dir/v=<batch_id>``;
  readers resolve the newest version that has a ``_SUCCESS`` marker, so
  a crash mid-rewrite leaves the previous snapshot intact (nothing to
  lose) and the retry overwrites the same half-written version dir.
  Old versions are pruned after the new one commits (the index's own
  maintenance — each snapshot is complete, so exactly one survives).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..maintenance import _fs_and_path
from ..operators.bloom import split_by_bloom
from ..operators.lines import line_mentions


def _versions(spark: SparkSession, index_dir: str) -> list[int]:
    """Committed snapshot numbers under index_dir (v=<N> dirs holding a
    _SUCCESS marker), ascending; [] if none (missing dir, flat layout,
    or FS error). Hadoop FS API — hdfs/s3a/file alike."""
    try:
        fs, root, jvm = _fs_and_path(spark, index_dir)
        if not fs.exists(root):
            return []
        Path = jvm.org.apache.hadoop.fs.Path
        out: list[int] = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("v=")):
                continue
            try:
                n = int(name[2:])
            except ValueError:
                continue
            if fs.exists(Path(st.getPath(), "_SUCCESS")):
                out.append(n)
        return sorted(out)
    except Exception:
        return []


def index_df(
    spark: SparkSession, index_dir: str, before: int | None = None
) -> DataFrame:
    """The persisted (h, df) line-frequency index; empty on first run.

    Resolves the newest committed snapshot (see module docstring).
    ``before`` bounds the search to versions < before — the retry path
    must resolve the PREDECESSOR snapshot, never one a crashed attempt
    of the same batch already committed (reading the batch's own counts
    back would double them). When a versioned layout exists but no
    version qualifies, the index is empty by definition — never fall
    through to reading the root (partition discovery would surface the
    crashed attempt's rows)."""
    vs = _versions(spark, index_dir)
    if vs:
        eligible = [n for n in vs if before is None or n < before]
        if not eligible:
            return spark.createDataFrame([], "h bigint, df bigint")
        path = f"{index_dir.rstrip('/')}/v={eligible[-1]}"
    else:
        path = index_dir  # pre-versioning flat layout, or first run
    try:
        return spark.read.parquet(path).select("h", "df")
    except AnalysisException:
        return spark.createDataFrame([], "h bigint, df bigint")


def gate_batch(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    index_bloom: list[int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(deduped_docs, updated_index) for one batch against the index.
    Pure DataFrame logic — shared by the streaming foreachBatch and
    direct batch callers (pins streaming == cumulative batch in tests).

    ``index_bloom`` (a word table from operators.bloom covering the
    index's line hashes) short-circuits the index join for lines the
    filter proves NEW — the dominant case on a healthy crawl. Rows the
    filter can't rule out take the join they would have taken anyway, so
    results are byte-identical with or without it (false positives cost
    a join row, false negatives can't happen). At scale this is the
    difference between shuffling every batch mention and shuffling only
    the few that might be known boilerplate.
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would delete every line)")
    mentions = line_mentions(batch, id_col, text_col)
    # Blank lines (h NULL) are exempt from dedup — and routed AROUND the
    # hash-keyed shuffles entirely: a window or join keyed on h would
    # otherwise send every blank line in the batch to ONE task (the NULL
    # key co-locates; at bulk-backfill batch sizes that is a straggler),
    # and a NULL key can never match the index anyway.
    blanks = (
        mentions.where(F.col("h").isNull())
        .withColumn("df_batch", F.lit(None).cast("long"))
        .withColumn("df_prior", F.lit(None).cast("long"))
    )
    live = mentions.where(F.col("h").isNotNull())
    prior = index.withColumnRenamed("df", "df_prior")
    # hub-skew-safe batch df (same device as operators/lines.py): a
    # partial-aggregated groupBy plus an AQE-skew-splittable join, never
    # a count window on h — bulk backfill batches carry the same
    # by-design hub lines the corpus does
    counts = live.groupBy("h").agg(F.count("*").alias("df_batch"))
    counted = live.join(counts, "h")
    if index_bloom is not None:
        maybe, new = split_by_bloom(counted, index_bloom, "h")
        joined = maybe.join(prior, "h", "left").unionByName(
            new.withColumn("df_prior", F.lit(None).cast("long"))
        )
    else:
        joined = counted.join(prior, "h", "left")
    joined = joined.unionByName(blanks)
    tagged = joined.withColumn(
        "df_total",
        F.col("df_batch") + F.coalesce(F.col("df_prior"), F.lit(0)),
    )
    keep = F.col("h").isNull() | (F.col("df_total") < min_df)
    survivors = tagged.where(keep)
    reassembled = survivors.groupBy("doc").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    spine = batch.select(F.col(id_col).alias("doc"))
    deduped = (
        spine.join(reassembled, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
    )
    batch_counts = (
        mentions.where(F.col("h").isNotNull()).groupBy("h").agg(F.count("*").alias("df_batch"))
    )
    updated = (
        batch_counts.join(prior, "h", "full")
        .select(
            "h",
            (
                F.coalesce(F.col("df_batch"), F.lit(0))
                + F.coalesce(F.col("df_prior"), F.lit(0))
            ).alias("df"),
        )
    )
    return deduped, updated


def bloom_path(index_dir: str, version: int) -> str:
    # The filter lives in a SIBLING dir (<index>.bloom/v=N), never inside
    # index_dir: the near-dedup index reads its root with partition
    # discovery, which a foreign subdirectory would break.
    return f"{index_dir.rstrip('/')}.bloom/v={version}"


def load_bloom(
    spark: SparkSession, index_dir: str, before: int | None = None
) -> list[int] | None:
    """The persisted bloom word table covering the index's hashes, or
    None when absent (first run / feature off / crashed write — the
    caller then takes the plain-join path, which is always correct).
    Same predecessor rule as index_df: the retry path must resolve the
    snapshot a crashed attempt of the SAME batch did not write."""
    root = f"{index_dir.rstrip('/')}.bloom"
    vs = _versions(spark, root)
    eligible = [n for n in vs if before is None or n < before]
    if not eligible:
        return None
    try:
        row = spark.read.parquet(bloom_path(index_dir, eligible[-1])).first()
        return list(row["words"]) if row else None
    except (AnalysisException, Exception):
        return None


def _save_bloom(
    spark: SparkSession, index_dir: str, version: int, words: list[int]
) -> None:
    spark.createDataFrame([(words,)], "words array<long>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(bloom_path(index_dir, version))
    try:  # prune: same keep-2 rule as the index snapshots
        root = f"{index_dir.rstrip('/')}.bloom"
        keep = {f"v={n}" for n in _versions(spark, root)[-2:]}
        keep.add(f"v={version}")
        fs, hroot, jvm = _fs_and_path(spark, root)
        for st in fs.listStatus(hroot):
            name = st.getPath().getName()
            if name.startswith("v=") and name not in keep:
                fs.delete(st.getPath(), True)
    except Exception:
        pass


def process_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    use_bloom: bool = False,
    sketch_dir: str | None = None,
) -> None:
    """One micro-batch's side effects, idempotent under foreachBatch
    retry (module-level so the retry contract is directly testable):
    docs → ``out_dir/batch=<id>`` dynamic overwrite first, index
    snapshot ``v=<id>`` second, prune last. Re-running the same
    (batch, batch_id) is a byte-level no-op: the doc partition is
    replaced with identical rows and the snapshot is recomputed from
    the same predecessor.

    ``sketch_dir`` adds per-batch telemetry (operators/sketches.py): a
    one-row mergeable sketch of the EMITTED documents lands under
    ``sketch_dir/batch=<id>`` (same dynamic-overwrite idempotence as the
    doc sink), so `incremental_card` can report "stats of the gated
    output so far" without ever rescanning out_dir.

    ``use_bloom`` maintains a broadcast Bloom filter next to the index
    (operators/bloom.py): the gate joins only mentions the filter can't
    prove new, and the filter is updated by UNIONING in the batch's own
    hashes (bit_or of word tables — one batch-sized aggregation, the
    corpus is never rescanned). Missing/corrupt filter self-heals to
    the plain join; results are identical either way."""
    from ..operators.bloom import build_bloom

    spark = batch.sparkSession
    bid = int(batch_id)
    prior_bloom = load_bloom(spark, index_dir, before=bid) if use_bloom else None
    deduped, updated = gate_batch(
        batch,
        index_df(spark, index_dir, before=bid),
        id_col,
        text_col,
        min_df,
        index_bloom=prior_bloom,
    )
    (
        deduped.withColumn("batch", F.lit(bid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(out_dir)
    )
    if sketch_dir is not None:
        from ..operators.sketches import write_batch_sketch

        # Telemetry of what this batch EMITTED; a retry recomputes the
        # identical deduped frame and replaces its own partition.
        write_batch_sketch(deduped, bid, sketch_dir, text_col=text_col)
    # New snapshot reads v=<predecessor> and writes v=<id> — different
    # paths, so no read-under-write and no checkpoint materialization.
    updated.write.mode("overwrite").parquet(f"{index_dir.rstrip('/')}/v={bid}")
    if use_bloom:
        batch_words = build_bloom(
            line_mentions(batch, id_col, text_col)
            .where(F.col("h").isNotNull())
            .select("h")
            .distinct(),
            "h",
            # Union compatibility: a filter is only OR-able with one of
            # the same geometry, so inherit the prior's size.
            num_bits=(len(prior_bloom) * 64) if prior_bloom else 1 << 24,
        )
        if prior_bloom is not None:
            batch_words = [a | b for a, b in zip(prior_bloom, batch_words)]
        _save_bloom(spark, index_dir, bid, batch_words)
    # Prune: keep THIS snapshot and its immediate predecessor. The
    # predecessor must survive until the checkpoint commits (a retry of
    # this batch_id re-reads it); batch N+1 running at all proves N
    # committed, and its prune pass retires N-1. Best-effort — a missed
    # prune is retried next batch.
    try:
        keep = {f"v={n}" for n in _versions(spark, index_dir)[-2:]}
        keep.add(f"v={bid}")
        fs, root, jvm = _fs_and_path(spark, index_dir)
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v=") and name not in keep:
                fs.delete(st.getPath(), True)
    except Exception:
        pass


def streaming_line_dedup(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    use_bloom: bool = False,
    sketch_dir: str | None = None,
):
    """Run the gate over a streaming DataFrame of documents; returns the
    started StreamingQuery (availableNow in tests, continuous in
    production)."""

    def _one_batch(batch: DataFrame, batch_id: int) -> None:
        process_batch(
            batch, batch_id, index_dir, out_dir, id_col, text_col, min_df,
            use_bloom=use_bloom, sketch_dir=sketch_dir,
        )

    return (
        docs.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

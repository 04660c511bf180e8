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
operators.bucketing for the registry)."""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..operators.lines import line_mentions


def index_df(spark: SparkSession, index_dir: str) -> DataFrame:
    """The persisted (h, df) line-frequency index; empty on first run.
    Spark-FS probe (AnalysisException), not os.path.exists — see
    ingest._registry_names."""
    try:
        return spark.read.parquet(index_dir).select("h", "df")
    except AnalysisException:
        return spark.createDataFrame([], "h bigint, df bigint")


def gate_batch(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """(deduped_docs, updated_index) for one batch against the index.
    Pure DataFrame logic — shared by the streaming foreachBatch and
    direct batch callers (pins streaming == cumulative batch in tests).
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would delete every line)")
    mentions = line_mentions(batch, id_col, text_col)
    cw = Window.partitionBy("h")
    prior = index.withColumnRenamed("df", "df_prior")
    tagged = (
        mentions.withColumn(
            "df_batch", F.when(F.col("h").isNotNull(), F.count("*").over(cw))
        )
        .join(prior, "h", "left")
        .withColumn(
            "df_total",
            F.col("df_batch") + F.coalesce(F.col("df_prior"), F.lit(0)),
        )
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


def streaming_line_dedup(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
):
    """Run the gate over a streaming DataFrame of documents; returns the
    started StreamingQuery (availableNow in tests, continuous in
    production)."""

    def _one_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        deduped, updated = gate_batch(
            batch, index_df(spark, index_dir), id_col, text_col, min_df
        )
        # The updated index REPLACES the old one; materialize it before
        # the overwrite or the read-under-write corrupts it.
        staged = updated.localCheckpoint(eager=True)
        deduped.write.mode("append").parquet(out_dir)
        staged.write.mode("overwrite").parquet(index_dir)

    return (
        docs.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

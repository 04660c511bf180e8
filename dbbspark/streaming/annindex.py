"""Streaming ANN-index gate — rolling-corpus embedding dedup over a
persisted IVFPQ index (SURVEY.md §2.11 C39; composes C35's codes with
the C17/C30 gate discipline).

A crawl's embedding stream needs the SemDeDup decision — "is this
semantically new?" — against everything previously ACCEPTED, without
ever re-scoring the corpus against itself. Keeping float vectors as the
corpus memory is what makes that expensive; this gate keeps only the
IVFPQ index rows (cell + m sub-codes + norm ≈ 8-16 bytes/vector vs 4d
bytes of float32) and, per micro-batch:

1. encodes the batch against the FIXED centroids/codebooks (map-only;
   the quantizer is trained once on a bootstrap sample — retraining
   mid-stream would silently re-key the whole index);
2. ADC-scores the batch against the prior index (`pq.ivfpq_topk` —
   batch rows are the query side, micro-batch-sized by construction)
   and rejects vectors within ``eps`` cosine of an indexed one;
3. within the batch, greedy keep-lowest-id among mutual near-dups
   (same one-pass convention as streaming/neardedup.py step 3);
4. appends accepted vectors + their index rows, docs-first/index-last,
   both as ``batch=<id>`` dynamic-partition overwrites — retry replaces
   its own partitions, and the index read excludes partitions >=
   batch_id so a crashed attempt can't collide the batch with itself.

Two rejection rules compose:

- VECTOR-HASH IDENTITY (exact): each index row carries
  xxhash64(embedding); a batch vector whose hash matches an indexed
  one is a byte-identical duplicate — caught with zero false negatives
  however coarse the quantizer, and with no dependence on ADC error.
  (Quantization-BUCKET identity was deliberately rejected as the exact
  rule: with a coarse codebook it collapses merely-similar items —
  measured on the multimodal example, 47 items → 12 survivors under
  bucket identity vs the intended dups-only rejection.)
- ADC THRESHOLD (operating): vectors within ``eps`` ADC-cosine of an
  indexed one. The ADC estimate errs both ways (it compares the float
  query to the QUANTIZED corpus row), so ``eps`` is an operating
  threshold, not an exact ε-ball — production pipelines follow the
  accept path with the exact re-rank (`pq_topk_reranked`) when the
  boundary must be crisp.

Tests pin what is exact regardless: hash-identity collisions, retry
idempotence, stream ≡ batch, and index accounting."""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.pq import ivfpq_encode, ivfpq_topk


def _index_codes(
    spark: SparkSession, index_dir: str, before: int | None = None
) -> DataFrame:
    """The persisted (vec_id, cell, code, norm) index; empty on first
    run. Same partition-bounded read rule as neardedup._index_signatures."""
    try:
        idx = spark.read.parquet(index_dir)
        if before is not None and "batch" in idx.columns:
            idx = idx.where(F.col("batch") < before)
        return idx.select("vec_id", "cell", "code", "norm", "vhash")
    except AnalysisException:
        return spark.createDataFrame(
            [],
            "vec_id long, cell long, code array<bigint>, norm double, "
            "vhash long",
        )


def gate_batch(
    batch: DataFrame,
    index_codes: DataFrame,
    centroids: DataFrame,
    codebooks,
    eps: float = 0.05,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(accepted_vectors, accepted_index_rows) for one batch against the
    prior index. Pure DataFrame logic, shared by streaming and batch
    callers (pins streaming ≡ batch in tests)."""
    if not 0.0 < eps < 1.0:
        raise ValueError("eps must be in (0, 1)")
    enc = ivfpq_encode(batch, centroids, codebooks, id_col, vec_col).join(
        batch.select(
            F.col(id_col).alias("vec_id"),
            F.xxhash64(F.col(vec_col)).alias("vhash"),
        ),
        "vec_id",
    )
    cut = 1.0 - eps
    # exact rule: identical embedding hash as an indexed row ⇒ duplicate
    code_rejects = (
        enc.join(index_codes.select(F.col("vhash").alias("__vh")),
                 enc.vhash == F.col("__vh"), "left_semi")
        .select(F.col("vec_id").alias(id_col))
        .distinct()
    )
    # within batch, same rule, keep-lowest id
    e2 = enc.select(
        F.col("vec_id").alias("__other"), F.col("vhash").alias("__vh2")
    )
    code_rejects_within = (
        enc.join(e2, enc.vhash == F.col("__vh2"))
        .where(F.col("__other") < F.col("vec_id"))
        .select(F.col("vec_id").alias(id_col))
        .distinct()
    )
    # operating rule: within eps ADC-cosine of an indexed row
    if index_codes.isEmpty():
        vs_corpus_rejects = batch.select(F.col(id_col)).limit(0)
    else:
        hits = ivfpq_topk(
            index_codes, batch, centroids, codebooks,
            k=1, probes=probes, id_col=id_col, vec_col=vec_col,
        )
        vs_corpus_rejects = (
            hits.where(F.col("sim") >= cut).select(
                F.col("query_id").alias(id_col)
            )
        )
    # within batch: greedy keep-lowest — a batch row colliding with a
    # LOWER-id batch row is rejected (one-pass convention on chains)
    self_hits = ivfpq_topk(
        enc, batch, centroids, codebooks,
        k=8, probes=probes, id_col=id_col, vec_col=vec_col,
    )
    within_rejects = (
        self_hits.where(
            (F.col("sim") >= cut) & (F.col("neighbor_id") < F.col("query_id"))
        )
        .select(F.col("query_id").alias(id_col))
        .distinct()
    )
    rejected = (
        code_rejects.unionByName(code_rejects_within)
        .unionByName(vs_corpus_rejects)
        .unionByName(within_rejects)
        .distinct()
    )
    accepted = batch.join(rejected, id_col, "left_anti")
    accepted_codes = enc.join(
        accepted.select(F.col(id_col).alias("vec_id")), "vec_id", "left_semi"
    )
    return accepted, accepted_codes


def process_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    accepted_dir: str,
    centroids: DataFrame,
    codebooks,
    eps: float = 0.05,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch's side effects, idempotent under foreachBatch
    retry — vectors first, index last, batch=<id> dynamic overwrites,
    predecessor-bounded index read (same contract as neardedup)."""
    spark = batch.sparkSession
    bid = int(batch_id)
    accepted, accepted_codes = gate_batch(
        batch,
        _index_codes(spark, index_dir, before=bid),
        centroids,
        codebooks,
        eps,
        probes,
        id_col,
        vec_col,
    )
    for df, sink in ((accepted, accepted_dir), (accepted_codes, index_dir)):
        (
            df.withColumn("batch", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(sink)
        )


def streaming_ann_gate(
    vectors: DataFrame,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    codebooks,
    eps: float = 0.05,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Run the gate over a streaming DataFrame of embeddings; returns
    the started StreamingQuery (availableNow in tests)."""

    def _one_batch(batch: DataFrame, batch_id: int) -> None:
        process_batch(
            batch, batch_id, index_dir, accepted_dir,
            centroids, codebooks, eps, probes, id_col, vec_col,
        )

    return (
        vectors.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

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
    gen: int | None = None,
) -> None:
    """One micro-batch's side effects, idempotent under foreachBatch
    retry — vectors first, index last, batch=<id> dynamic overwrites,
    predecessor-bounded index read (same contract as neardedup).

    ``gen`` (drift-gate callers) stamps the appended index rows with the
    quantizer generation, so a restart can detect codes encoded under a
    different codebook than the persisted quantizer."""
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
    if gen is not None:
        accepted_codes = accepted_codes.withColumn("gen", F.lit(int(gen)))
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


# ---------------------------------------------------------------------------
# Quantizer drift policy (VERDICT r4 item 3): the gate above runs on FROZEN
# centroids/codebooks — right for a stationary stream, silently degrading
# when the embedding distribution drifts (new domain, new encoder version):
# cells unbalance, residuals leave the codebooks' support, ADC scores
# decay, and the eps threshold stops meaning what it was tuned to mean.
# The drift SIGNAL is map-only and corpus-free: the cosine between each
# batch vector and its own IVFPQ reconstruction (high ⇔ the quantizer
# still fits the data). The C46 profiler machinery summarizes it per
# batch and `profile_drift(mean_shift_stds=...)` flags the shift; on
# breach the quantizer retrains on the durable accepted vectors and the
# code index is REBUILT (codes are meaningless across codebooks — a
# re-key, not an append). The vector-hash identity rule is unaffected
# throughout (exact regardless of quantizer), so retrains never
# reintroduce byte-identical duplicates.
# ---------------------------------------------------------------------------


def reconstruction_sims(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, recon_sim): cosine between each vector and its IVFPQ
    reconstruction (centroid + codebook entries) — the quantizer-fit
    signal. Map-only over Arrow batches; nothing touches the index."""
    import numpy as np
    import pandas as pd

    from ..operators.pq import _residuals

    books = np.asarray(codebooks, dtype=np.float64)
    m, _k, sub = books.shape
    cent_rows = centroids.select(id_col, vec_col).toPandas()
    C = {
        int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
        for _, r in cent_rows.iterrows()
    }
    cnorm2 = (books**2).sum(axis=2)
    res = _residuals(vectors, centroids, id_col, vec_col)

    def sims(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            R = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cells = pdf["cell"].to_numpy()
            recon = np.empty_like(R)
            for j in range(m):
                X = R[:, j * sub : (j + 1) * sub]
                d2 = cnorm2[j][None, :] - 2.0 * (X @ books[j].T)
                code = np.argmin(d2, axis=1)
                recon[:, j * sub : (j + 1) * sub] = books[j][code]
            cents = np.stack([C[int(c)] for c in cells])
            V = cents + R  # original vector = centroid + residual
            W = cents + recon  # its quantized reconstruction
            denom = np.linalg.norm(V, axis=1) * np.linalg.norm(W, axis=1)
            denom = np.where(denom == 0, 1.0, denom)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "recon_sim": (V * W).sum(axis=1) / denom,
                }
            )

    return res.select(id_col, "cell", vec_col).mapInPandas(
        sims, "vec_id long, recon_sim double"
    )


def quantizer_profile(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """One-pass C46 profile of the reconstruction-cosine distribution —
    the per-batch fit summary the drift check compares (O(1) driver
    state, mergeable with the profiler's sketch form if batched)."""
    from ..operators.profile import profile_table

    return profile_table(
        reconstruction_sims(
            vectors, centroids, codebooks, id_col, vec_col
        ).select("recon_sim")
    )


def quantizer_drift(
    baseline: dict, batch_profile: dict, stds: float = 2.0
) -> list[dict]:
    """profile_drift findings between the bootstrap-time fit profile and
    a batch's — a ``mean_shift`` on recon_sim is the retrain trigger."""
    from ..operators.profile import profile_drift

    return [
        f
        for f in profile_drift(baseline, batch_profile, mean_shift_stds=stds)
        if f["kind"] == "mean_shift"
    ]


def _quantizer_root(index_dir: str) -> str:
    # SIBLING dir (cf. linededup's `<index>.bloom`): never inside index_dir,
    # where partition discovery would try to parse it
    return f"{index_dir.rstrip('/')}.quantizer"


def save_quantizer(
    spark: SparkSession,
    index_dir: str,
    centroids: DataFrame,
    codebooks,
    baseline: dict | None,
    gen: int,
) -> None:
    """Persist the live quantizer (centroids + codebooks + drift baseline
    + generation) as a committed snapshot next to the index.

    Closes the ADVICE r5 restart hazard: the retrained quantizer used to
    live only in the driver-local ``state`` dict, so after a drift
    retrain rebuilt the index under new codebooks, a process restart
    re-entered the gate with the caller's ORIGINAL frozen quantizer —
    and the streaming checkpoint meant the triggering batches never
    replayed — leaving ADC scoring old codebooks against new-generation
    codes (silent eps-gate degradation; only the vhash rule stayed
    exact). Persisting through `commit.commit_snapshot` makes the save
    atomic and multi-writer safe; `load_quantizer` resolves the newest
    committed snapshot at gate start.

    One row, nested: centroids are n_cells × dim (quantizer-sized, not
    corpus-sized), so a single-row parquet is the right shape."""
    import json as _json

    import numpy as np

    from ..commit import commit_snapshot, prune_snapshots

    cent_rows = centroids.collect()
    row = (
        [[[float(x) for x in sub] for sub in book] for book in np.asarray(codebooks)],
        _json.dumps(baseline, default=float) if baseline is not None else None,
        [int(r[0]) for r in cent_rows],
        [[float(x) for x in r[1]] for r in cent_rows],
        int(gen),
    )
    schema = (
        "codebooks array<array<array<double>>>, baseline string, "
        "cent_ids array<bigint>, cent_vecs array<array<double>>, gen int"
    )

    def write_fn(path: str) -> None:
        spark.createDataFrame([row], schema).coalesce(1).write.parquet(path)

    root = _quantizer_root(index_dir)
    commit_snapshot(spark, root, write_fn)
    prune_snapshots(spark, root, keep_last=2)


def load_quantizer(
    spark: SparkSession, index_dir: str, id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(centroids_df, codebooks, baseline, gen) from the newest committed
    quantizer snapshot, or None when absent (first run). The restored
    centroids DataFrame is eagerly checkpointed — same contract as the
    bootstrap-trained one."""
    import json as _json

    from ..commit import read_latest

    df = read_latest(spark, _quantizer_root(index_dir))
    if df is None:
        return None
    row = df.first()
    if row is None:
        return None
    cents = spark.createDataFrame(
        list(zip(row["cent_ids"], [list(v) for v in row["cent_vecs"]])),
        f"{id_col} long, {vec_col} array<double>",
    ).localCheckpoint(eager=True)
    baseline = _json.loads(row["baseline"]) if row["baseline"] else None
    books = [[list(sub) for sub in book] for book in row["codebooks"]]
    return cents, books, baseline, int(row["gen"])


def index_generation(spark: SparkSession, index_dir: str) -> int | None:
    """The single generation stamped on the code index, or None when the
    index is absent/empty/unstamped. Raises on a MIXED index — codes
    from two codebook generations in one index corrupt every ADC score,
    so that state must never be scored against."""
    try:
        idx = spark.read.parquet(index_dir)
    except AnalysisException:
        return None
    if "gen" not in idx.columns:
        return None
    gens = [r["gen"] for r in idx.select("gen").distinct().collect()]
    gens = [g for g in gens if g is not None]
    if not gens:
        return None
    if len(gens) > 1:
        raise RuntimeError(
            f"{index_dir}: code index holds MIXED quantizer generations "
            f"{sorted(gens)} — rebuild it (rebuild_index) before gating"
        )
    return int(gens[0])


def retrain_quantizer(
    vectors: DataFrame,
    n_cells: int,
    m: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(centroids, codebooks) refit on the given vectors — same shapes
    as the frozen quantizer so every downstream consumer is drop-in."""
    from ..operators.pq import train_ivfpq
    from ..operators.similarity import train_centroids

    cents = train_centroids(vectors, k=n_cells, id_col=id_col, vec_col=vec_col)
    cents = cents.localCheckpoint(eager=True)
    books = train_ivfpq(vectors, cents, m=m, k=k, id_col=id_col, vec_col=vec_col)
    return cents, books


def rebuild_index(
    spark: SparkSession,
    accepted_dir: str,
    index_dir: str,
    centroids: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    gen: int | None = None,
) -> int:
    """Re-encode every ACCEPTED vector under a new quantizer and replace
    the code index wholesale (codes are codebook-relative — mixing
    generations would corrupt every ADC score). The accepted vectors are
    the durable source of truth, so a crashed rebuild is recovered by
    re-running it; batch partitions are preserved so the gate's
    predecessor-bounded reads keep working. ``gen`` stamps every row
    with the quantizer generation the codes were encoded under. Returns
    rows written."""
    acc = spark.read.parquet(accepted_dir)
    enc = ivfpq_encode(acc, centroids, codebooks, id_col, vec_col).join(
        acc.select(
            F.col(id_col).alias("vec_id"),
            F.xxhash64(F.col(vec_col)).alias("vhash"),
            "batch",
        ),
        "vec_id",
    )
    if gen is not None:
        enc = enc.withColumn("gen", F.lit(int(gen)))
    enc.write.mode("overwrite").partitionBy("batch").parquet(index_dir)
    return spark.read.parquet(index_dir).count()


def streaming_ann_gate_with_drift(
    vectors: DataFrame,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    codebooks,
    eps: float = 0.05,
    probes: int = 2,
    drift_stds: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The frozen-quantizer gate plus the codebook-refresh policy.

    Per micro-batch, BEFORE gating: profile the batch's reconstruction
    cosines against the quantizer's baseline profile (established on the
    first batch). On a ``mean_shift`` beyond ``drift_stds`` baseline
    standard deviations: retrain centroids+codebooks on accepted ∪
    batch vectors, rebuild the code index under the new quantizer, and
    re-baseline. Retraining is deterministic (fixed k-means seeds) and
    the rebuild is a full overwrite, so a foreachBatch retry that
    re-triggers the retrain converges to the same state.

    RESTART SAFETY (ADVICE r5): the live quantizer + baseline persist as
    a committed snapshot next to the index (`save_quantizer`, atomic via
    the commit protocol) on every baseline/retrain change, and gate
    start resolves the persisted quantizer IN PREFERENCE to the caller's
    argument — a restarted process whose checkpoint skips the retrain
    batches still scores with the retrained codebooks. Index rows carry
    the quantizer generation; a crash between quantizer-save and
    index-rebuild is detected at start (generation mismatch) and healed
    by re-running the rebuild from the durable accepted vectors.

    Returns (StreamingQuery, state) where ``state`` exposes the live
    quantizer, ``state['gen']`` the codebook generation, and
    ``state['retrains']`` counts refreshes (observability: a production
    deployment alerts on this, it should be rare)."""
    import numpy as np

    spark0 = vectors.sparkSession
    persisted = load_quantizer(spark0, index_dir, id_col, vec_col)
    if persisted is not None:
        p_cents, p_books, p_baseline, p_gen = persisted
        state = {
            "centroids": p_cents,
            "codebooks": p_books,
            "baseline": p_baseline,
            "retrains": 0,
            "n_cells": p_cents.count(),
            "gen": p_gen,
        }
        # heal the save→rebuild crash window: codes stamped with an older
        # generation than the persisted quantizer are stale ciphertext —
        # re-encode them from the accepted vectors before any gating
        idx_gen = index_generation(spark0, index_dir)
        if idx_gen is not None and idx_gen != p_gen:
            rebuild_index(
                spark0, accepted_dir, index_dir,
                p_cents, p_books, id_col, vec_col, gen=p_gen,
            )
    else:
        state = {
            "centroids": centroids.localCheckpoint(eager=True),
            "codebooks": codebooks,
            "baseline": None,
            "retrains": 0,
            "n_cells": centroids.count(),
            "gen": 0,
        }
        save_quantizer(
            spark0, index_dir, state["centroids"], state["codebooks"],
            None, 0,
        )

    m, k, _sub = np.asarray(state["codebooks"]).shape

    def _one_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prof = quantizer_profile(
            batch, state["centroids"], state["codebooks"], id_col, vec_col
        )
        if state["baseline"] is None:
            state["baseline"] = prof
            save_quantizer(
                spark, index_dir, state["centroids"], state["codebooks"],
                prof, state["gen"],
            )
        elif quantizer_drift(state["baseline"], prof, stds=drift_stds):
            try:
                acc = spark.read.parquet(accepted_dir).select(id_col, vec_col)
            except AnalysisException:
                acc = batch.select(id_col, vec_col).limit(0)
            train_src = acc.unionByName(batch.select(id_col, vec_col))
            state["centroids"], state["codebooks"] = retrain_quantizer(
                train_src, state["n_cells"], m, k, id_col, vec_col
            )
            state["baseline"] = quantizer_profile(
                batch, state["centroids"], state["codebooks"], id_col, vec_col
            )
            state["gen"] += 1
            # durability order: quantizer snapshot FIRST (it is the key to
            # the codes), index re-key second — a crash between the two is
            # exactly what the start-time generation check repairs
            save_quantizer(
                spark, index_dir, state["centroids"], state["codebooks"],
                state["baseline"], state["gen"],
            )
            if not acc.isEmpty():
                rebuild_index(
                    spark, accepted_dir, index_dir,
                    state["centroids"], state["codebooks"], id_col, vec_col,
                    gen=state["gen"],
                )
            state["retrains"] += 1
        process_batch(
            batch, batch_id, index_dir, accepted_dir,
            state["centroids"], state["codebooks"], eps, probes, id_col,
            vec_col, gen=state["gen"],
        )

    q = (
        vectors.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, state

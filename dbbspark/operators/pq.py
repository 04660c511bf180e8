"""Product quantization for ANN at corpus scale (SURVEY.md §2.11 C35;
Jégou et al. 2011, "Product Quantization for Nearest Neighbor Search").

Extends the similarity family's compression ladder (float → int8 in
operators/similarity.py:quantize_embeddings) to its asymptotic end: a
d-dim embedding becomes m sub-codes of log2(k) bits each — e.g. d=64
float32 (256 B) → m=8 codes (8 B), a 32× cut in everything downstream
(scan, shuffle, cache). Scoring uses asymmetric distance computation
(ADC): per query, one m×k lookup table of sub-inner-products is built
ONCE, then every corpus code row is scored by m table lookups + a sum —
no per-pair matmul at all.

Spark mapping:

- TRAINING: m independent k-means fits (pyspark.ml, distributed Lloyd)
  over the m sub-vector slices; the codebook set is m·k·(d/m) = k·d
  floats — identical driver footprint to one IVF centroid set.
- ENCODE: mapInPandas argmin per subspace over Arrow batches — map-only,
  the corpus never shuffles.
- SEARCH: queries (small side by construction) are collected and closed
  over; each Arrow batch of codes is scored via numpy take + sum, and
  ONLY the per-batch per-query top-k leave the worker — the shuffle
  carries O(batches · |Q| · k) candidate rows, never |Q|×N scores. A
  final window rank merges batch winners (deterministic id tiebreak).
- RERANK: the approximate top-`rerank_depth` join back to the float
  vectors (candidate set is |Q|·depth — broadcast-sized) and exact
  cosine reorders them; recall is then bounded by candidate coverage,
  not ADC error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _unit
from pyspark.sql.window import Window


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
):
    """Train the m per-subspace codebooks; returns a numpy array of shape
    (m, k, d/m) — k·d floats total, the same driver-bounded footprint as
    an IVF centroid set. d must divide evenly into m subspaces."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # The subspace width is COLUMN arithmetic (size(vec) div m), so no
    # pre-fit dimension job runs — the first Spark job is the first
    # KMeans fit itself (pinned by tests/test_pq.py). Divisibility is
    # checked by an assert_true that rides the fit's own scan: NULL on
    # success (coalesced into the slice length so it must evaluate),
    # raises inside the job on a bad dim; the except arm converts it to
    # the same ValueError the probe used to raise driver-side.
    dim_err = f"__dbbspark_pq_dim_not_divisible_by_{m}__"
    size_c = F.size(F.col(vec_col))
    guard = F.coalesce(
        F.assert_true(size_c % m == 0, F.lit(dim_err)).cast("int"), F.lit(0)
    )
    sub_c = F.floor(size_c / m).cast("int") + guard
    books = []
    for j in range(m):
        feat = vectors.select(
            array_to_vector(
                F.slice(
                    F.col(vec_col), F.lit(j) * sub_c + 1, sub_c
                ).cast("array<double>")
            ).alias("features")
        )
        try:
            model = KMeans(k=k, seed=seed + j, maxIter=max_iter).fit(feat)
        except Exception as exc:
            if dim_err in str(exc):
                raise ValueError(
                    f"embedding dim not divisible into {m} subspaces"
                ) from exc
            if j == 0 and vectors.limit(1).count() == 0:
                raise ValueError("cannot train PQ on an empty frame") from exc
            raise
        centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
        if len(centers) < k:
            # degenerate subspace (< k distinct points): k-means returns
            # fewer centers. Pad by repeating the first center — argmin
            # takes the first occurrence, so codes are identical to the
            # unpadded assignment and the (m, k, sub) shape stays uniform.
            pad = np.repeat(centers[:1], k - len(centers), axis=0)
            centers = np.concatenate([centers, pad])
        books.append(centers)
    return np.stack(books)  # (m, k, sub)


def pq_encode(
    vectors: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code array<int>, norm double): each vector's per-subspace
    nearest codebook entry, plus the RECONSTRUCTION norm (used to
    normalize ADC inner products into cosine-comparable scores).
    Map-only over Arrow batches."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)
    m, _k, sub = books.shape
    # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin over c drops ||x||².
    cnorm2 = (books**2).sum(axis=2)  # (m, k)

    def enc(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(V), m), dtype=np.int64)
            rnorm2 = np.zeros(len(V))
            for j in range(m):
                X = V[:, j * sub : (j + 1) * sub]
                d2 = cnorm2[j][None, :] - 2.0 * (X @ books[j].T)
                codes[:, j] = np.argmin(d2, axis=1)
                rnorm2 += cnorm2[j][codes[:, j]]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "code": list(codes),
                    "norm": np.sqrt(np.maximum(rnorm2, 1e-24)),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        enc, "vec_id long, code array<bigint>, norm double"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k neighbors per query over PQ codes (ADC).

    (query_id, neighbor_id, rank, sim): sim is the ADC cosine estimate
    q·recon(code) / (‖q‖·‖recon‖). Each Arrow batch emits only its own
    per-query top-k (partial top-k inside the worker), so the shuffle is
    candidate-sized; the window merge re-ranks batch winners exactly."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _kc, sub = books.shape
    qrows = queries.select(id_col, vec_col).toPandas()
    Q = np.stack(qrows[vec_col].to_numpy()).astype(np.float64)
    Qn = _unit(Q)
    qids = qrows[id_col].to_numpy()
    # LUT[q, j, c] = q's j-th subvector · codebook_j[c]
    lut = np.einsum("qjs,jcs->qjc", Qn.reshape(len(Q), m, sub), books)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["code"].to_numpy())  # (n, m)
            norms = pdf["norm"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            n = len(C)
            # ip[q, i] = sum_j lut[q, j, C[i, j]]
            ip = np.zeros((len(qids), n))
            for j in range(m):
                ip += lut[:, j, :][:, C[:, j]]
            sims = ip / np.maximum(norms[None, :], 1e-24)
            kk = min(k + 1, n)  # +1 absorbs a possible self-pair
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids, kk),
                "vid": vids[part.ravel()],
                "sim": np.take_along_axis(sims, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    scored = codes.select("vec_id", "code", "norm").mapInPandas(
        score, "query_id long, vid long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        scored.where(F.col("vid") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias("neighbor_id"), "rank", "sim")
    )


def train_ivfpq(
    vectors: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Codebooks for RESIDUAL product quantization (the IVFPQ layout,
    Jégou et al. 2011 §IV): PQ is trained on v − centroid(cell(v)), which
    concentrates the distribution each codebook sees and roughly halves
    quantization error vs raw-vector PQ at the same bit budget. The
    residual computation is one broadcast join (centroids are the small
    side by construction) + map-only arithmetic."""
    res = _residuals(vectors, centroids, id_col, vec_col)
    return train_pq(res, m=m, k=k, vec_col=vec_col)


def _residuals(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cell, residual-as-vec_col): each vector minus its nearest
    centroid. Assignment reuses ivf_assign (map-side argmax); the
    subtraction is zip_with — pure expressions, no Python."""
    from .similarity import ivf_assign

    assigned = ivf_assign(vectors, centroids, id_col, vec_col).select(
        F.col("vid").alias(id_col), F.col("centroid_id").alias("cell")
    )
    cents = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("__cent")
    )
    return (
        vectors.join(assigned, id_col)
        .join(F.broadcast(cents), "cell")
        .select(
            id_col,
            "cell",
            F.zip_with(vec_col, "__cent", lambda a, b: a - b).alias(vec_col),
        )
    )


def ivfpq_encode(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, code, norm): the compact IVFPQ index row. ``norm`` is
    the exact reconstruction norm ‖centroid + recon(residual)‖ computed
    at encode time, which is what lets ADC return cosine-comparable
    scores later without touching the float vectors."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _k, sub = books.shape
    cent_rows = centroids.select(id_col, vec_col).toPandas()
    C = {
        int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
        for _, r in cent_rows.iterrows()
    }
    cnorm2 = (books**2).sum(axis=2)
    res = _residuals(vectors, centroids, id_col, vec_col)

    def enc(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            R = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cells = pdf["cell"].to_numpy()
            codes = np.empty((len(R), m), dtype=np.int64)
            recon = np.empty_like(R)
            for j in range(m):
                X = R[:, j * sub : (j + 1) * sub]
                d2 = cnorm2[j][None, :] - 2.0 * (X @ books[j].T)
                codes[:, j] = np.argmin(d2, axis=1)
                recon[:, j * sub : (j + 1) * sub] = books[j][codes[:, j]]
            cents = np.stack([C[int(c)] for c in cells])
            norms = np.linalg.norm(cents + recon, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cells,
                    "code": list(codes),
                    "norm": np.maximum(norms, 1e-24),
                }
            )

    return res.select(id_col, "cell", vec_col).mapInPandas(
        enc, "vec_id long, cell long, code array<bigint>, norm double"
    )


def ivfpq_topk(
    index: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks,
    k: int = 10,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k per query over an IVFPQ index: each query
    probes its ``probes`` nearest cells and ADC-scores only rows living
    there. Because reconstruction = centroid + Σ codebook entries, the
    score decomposes into a per-(query, cell) scalar (q·centroid,
    computed once driver-side on the small centroid set) plus the SAME
    residual LUT as plain PQ — per Arrow batch, a masked lookup-sum, and
    only per-batch per-query top-k rows leave the worker.

    At full scale, bucket/partition the index by ``cell`` so unprobed
    cells are never read (partition pruning does to this operator what
    it does to date-partitioned facts); the mapInPandas form here still
    bounds compute at Σ_probed |cell| per query, never |Q|×N."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _kc, sub = books.shape
    qrows = queries.select(id_col, vec_col).toPandas()
    Q = np.stack(qrows[vec_col].to_numpy()).astype(np.float64)
    Qn = _unit(Q)
    qids = qrows[id_col].to_numpy()
    cent_rows = centroids.select(id_col, vec_col).toPandas()
    cent_ids = cent_rows[id_col].to_numpy()
    CM = np.stack(cent_rows[vec_col].to_numpy()).astype(np.float64)
    n_probes = min(probes, len(cent_ids))
    # q·centroid for every (query, cell) + each query's probed cell set
    qc = Qn @ CM.T  # (nq, ncells) — both sides driver-bounded
    order = np.argsort(-qc, axis=1)[:, :n_probes]
    probe_sets = [set(int(cent_ids[j]) for j in row) for row in order]
    qc_by_cell = {int(c): qc[:, j] for j, c in enumerate(cent_ids)}
    lut = np.einsum("qjs,jcs->qjc", Qn.reshape(len(Q), m, sub), books)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["code"].to_numpy())
            cells = pdf["cell"].to_numpy()
            norms = pdf["norm"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            res_ip = np.zeros((len(qids), len(C)))
            for j in range(m):
                res_ip += lut[:, j, :][:, C[:, j]]
            cent_ip = np.stack(
                [qc_by_cell[int(c)] for c in cells], axis=1
            )  # (nq, n)
            sims = (cent_ip + res_ip) / norms[None, :]
            out = {"query_id": [], "vid": [], "sim": []}
            for qi, qid in enumerate(qids):
                mask = np.fromiter(
                    (int(c) in probe_sets[qi] for c in cells),
                    dtype=bool,
                    count=len(cells),
                )
                if not mask.any():
                    continue
                s = sims[qi][mask]
                v = vids[mask]
                kk = min(k + 1, len(s))
                part = np.argpartition(-s, kk - 1)[:kk]
                out["query_id"].extend([qid] * kk)
                out["vid"].extend(v[part])
                out["sim"].extend(s[part])
            yield pd.DataFrame(out)

    scored = index.select("vec_id", "cell", "code", "norm").mapInPandas(
        score, "query_id long, vid long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        scored.where(F.col("vid") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias("neighbor_id"), "rank", "sim")
    )


def pq_topk_reranked(
    codes: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    rerank_depth: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist → exact cosine re-rank: fetch the approximate
    top-``rerank_depth`` per query, join back to the float vectors
    (candidate set is |Q|·depth rows — the small side, joined semi
    against the corpus), rescore exactly, keep the true top-k. Recall
    now depends only on the shortlist containing the true neighbors,
    the standard IVFPQ+rerank accounting."""
    from .similarity import matmul_scores

    cand = pq_topk(
        codes, queries, codebooks, rerank_depth, id_col, vec_col
    ).select("query_id", F.col("neighbor_id").alias(id_col))
    cand_vecs = vectors.join(
        cand.select(id_col).distinct(), id_col, "left_semi"
    )
    exact = matmul_scores(cand_vecs, queries, id_col, vec_col, out_id="query_id")
    # Keep only (query, candidate) pairs from the shortlist — matmul
    # scores every candidate against every query otherwise.
    exact = exact.join(
        cand.withColumnRenamed(id_col, "vid"), ["query_id", "vid"], "left_semi"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        exact.where(F.col("vid") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias("neighbor_id"), "rank")
    )

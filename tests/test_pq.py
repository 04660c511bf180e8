"""Product quantization (operators/pq.py, C35): encode determinism,
ADC recall floors, rerank recovery, and the full-depth-rerank ≡ exact
identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_topk_reranked,
    train_pq,
)
from dbbspark.operators.similarity import brute_force_topk
from dbbspark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") % 100 == 0)


@pytest.fixture(scope="module")
def books(emb):
    return train_pq(emb, m=4, k=8, max_iter=5)


@pytest.fixture(scope="module")
def codes(emb, books):
    return pq_encode(emb, books).cache()


def test_codebook_shape(emb, books):
    d = emb.select(F.size("embedding")).first()[0]
    assert books.shape == (4, 8, d // 4)


def test_encode_shape_and_range(codes):
    rows = codes.collect()
    assert all(len(r["code"]) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["code"])
    assert all(r["norm"] > 0 for r in rows)


def test_encode_partition_invariant(emb, books, codes):
    again = {
        r["vec_id"]: (tuple(r["code"]), round(r["norm"], 9))
        for r in pq_encode(emb.repartition(7), books).collect()
    }
    base = {
        r["vec_id"]: (tuple(r["code"]), round(r["norm"], 9))
        for r in codes.collect()
    }
    assert again == base


def _pairs(rows, k=5):
    return {(r["query_id"], r["neighbor_id"]) for r in rows if r["rank"] <= k}


def test_adc_recall_and_rerank_monotone(emb, queries):
    """The fixture embeddings are near-random — PQ's worst case (no
    cluster structure to exploit), so this uses the capacity end of the
    codebook grid (m=16 subspaces of 4 dims). Measured on this fixture:
    m=4/k=8 → ADC recall 0.08, m=16/k=16 → 0.40 raw / 0.96 reranked@50;
    floors sit under those with margin."""
    big_books = train_pq(emb, m=16, k=16, max_iter=5)
    big_codes = pq_encode(emb, big_books).cache()
    exact = _pairs(brute_force_topk(emb, queries, k=5).collect())
    adc = _pairs(pq_topk(big_codes, queries, big_books, k=5).collect())
    reranked = _pairs(
        pq_topk_reranked(
            big_codes, emb, queries, big_books, k=5, rerank_depth=50
        ).collect()
    )
    r_adc = len(exact & adc) / len(exact)
    r_rr = len(exact & reranked) / len(exact)
    assert r_adc >= 0.2, f"raw ADC recall collapsed: {r_adc:.2f}"
    assert r_rr >= r_adc - 1e-9, f"rerank lowered recall: {r_rr:.2f} < {r_adc:.2f}"
    assert r_rr >= 0.7, f"reranked recall floor: {r_rr:.2f}"


def test_full_depth_rerank_is_exact(emb, queries, books, codes):
    """With rerank_depth = corpus size the shortlist is the whole corpus,
    so the reranked result must EQUAL brute force — pins that the rerank
    join/rescore path itself loses nothing."""
    n = emb.count()
    exact = _pairs(brute_force_topk(emb, queries, k=5).collect())
    full = _pairs(
        pq_topk_reranked(codes, emb, queries, books, k=5, rerank_depth=n).collect()
    )
    assert full == exact


def test_topk_partition_invariant(queries, books, codes):
    """Per-batch partial top-k + window merge must not depend on the
    Arrow batch layout."""
    a = _pairs(pq_topk(codes, queries, books, k=5).collect())
    b = _pairs(pq_topk(codes.repartition(7), queries, books, k=5).collect())
    assert a == b


def test_ivfpq_scores_match_explicit_reconstruction(spark, emb, queries):
    """The distributed ADC path (per-query·centroid scalar + residual
    LUT + stored norms) must EQUAL cosine against the explicitly
    reconstructed vectors computed driver-side — the implementation-
    correctness pin that recall floors on near-random fixtures can't
    give. Also: recall monotone in probes, full index covered."""
    import numpy as np

    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window as W

    from dbbspark.operators.pq import ivfpq_encode, ivfpq_topk, train_ivfpq

    cents = emb.where(F2.col("vec_id") % 100 == 7).select(
        (F2.row_number().over(W.orderBy("vec_id")) - 1).alias("vec_id"),
        "embedding",
    ).localCheckpoint()
    n_cells = cents.count()
    books = train_ivfpq(emb, cents, m=16, k=16)
    index = ivfpq_encode(emb, cents, books).cache()
    assert index.count() == emb.count()

    # exactness: operator top-5 (all probes) == manual reconstruction
    C = {r["vec_id"]: np.array(r["embedding"]) for r in cents.collect()}
    IX = {
        r["vec_id"]: (r["cell"], np.array(r["code"]), r["norm"])
        for r in index.collect()
    }
    m = books.shape[0]
    qid = queries.select(F2.min("vec_id")).first()[0]
    q = np.array(
        emb.where(F2.col("vec_id") == qid).first()["embedding"], dtype=float
    )
    qn = q / np.linalg.norm(q)
    sims = {}
    for vid, (cell, code, norm) in IX.items():
        recon = C[cell] + np.concatenate([books[j][code[j]] for j in range(m)])
        assert abs(np.linalg.norm(recon) - norm) < 1e-9  # stored norm exact
        sims[vid] = qn @ recon / norm
    want = [
        v
        for v, _ in sorted(
            ((v, s) for v, s in sims.items() if v != qid),
            key=lambda t: (-t[1], t[0]),
        )[:5]
    ]
    got = [
        r["neighbor_id"]
        for r in ivfpq_topk(
            index,
            emb.where(F2.col("vec_id") == qid),
            cents,
            books,
            k=5,
            probes=n_cells,
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == want

    # probes monotonicity on the full query set
    exact = _pairs(brute_force_topk(emb, queries, k=5).collect())
    r = {}
    for p in (1, n_cells):
        hits = _pairs(
            ivfpq_topk(index, queries, cents, books, k=5, probes=p).collect()
        )
        r[p] = len(exact & hits) / len(exact)
    assert r[n_cells] >= r[1] - 1e-9, f"recall not monotone: {r}"
    assert r[n_cells] >= 0.1, f"full-probe IVFPQ recall collapsed: {r}"


def test_ivfpq_encode_partition_invariant(spark, emb):
    from pyspark.sql import functions as F2

    from dbbspark.operators.pq import ivfpq_encode, train_ivfpq

    cents = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(64)]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    books = train_ivfpq(emb, cents, m=4, k=8)
    a = {
        r["vec_id"]: (r["cell"], tuple(r["code"]), round(r["norm"], 9))
        for r in ivfpq_encode(emb, cents, books).collect()
    }
    b = {
        r["vec_id"]: (r["cell"], tuple(r["code"]), round(r["norm"], 9))
        for r in ivfpq_encode(emb.repartition(7), cents, books).collect()
    }
    assert a == b


def test_train_pq_validates(emb):
    with pytest.raises(ValueError):
        train_pq(emb, m=7)  # fixture dim not divisible by 7
    with pytest.raises(ValueError):
        train_pq(emb.limit(0), m=4)


def test_train_pq_no_prefit_dimension_job(spark, emb):
    """train_pq must launch exactly the jobs the KMeans fits launch —
    no driver-side dimension probe before the first fit (the subspace
    width is column arithmetic on size(vec))."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = emb.limit(1).select(F.size("embedding")).first()[0]
    frozen = emb.localCheckpoint(eager=True)
    jt = spark.sparkContext._jsc.sc().statusTracker()

    # baseline: one direct KMeans fit on the identical features frame
    feat = frozen.select(
        array_to_vector(
            F.slice(F.col("embedding"), 1, d).cast("array<double>")
        ).alias("features")
    )
    sc = spark.sparkContext
    sc.setJobGroup("pq_fit_base", "pin")
    KMeans(k=4, seed=7, maxIter=3).fit(feat)
    fit_jobs = len(jt.getJobIdsForGroup("pq_fit_base"))

    sc.setJobGroup("pq_train", "pin")
    train_pq(frozen, m=1, k=4, max_iter=3, seed=7)
    train_jobs = len(jt.getJobIdsForGroup("pq_train"))
    sc.setLocalProperty("spark.jobGroup.id", None)

    assert train_jobs == fit_jobs, (train_jobs, fit_jobs)

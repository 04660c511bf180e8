"""ANN quality: the IVF cell-probe search must keep reasonable recall vs
the exact brute-force top-k (it trades recall for a |cells|-fold cost
reduction; with 1 probe on random vectors recall is imperfect by design —
this pins a floor so regressions surface)."""

from __future__ import annotations

from dbbspark.catalog import load_all


def test_ivf_recall_floor(spark, sf_dir):
    cat = load_all()
    exact = cat["q_topk_cosine"].builder(spark, sf_dir).collect()
    approx = cat["q_ann_ivf"].builder(spark, sf_dir).collect()
    exact_top5 = {(r["query_id"], r["neighbor_id"]) for r in exact if r["rank"] <= 5}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert approx_pairs, "IVF returned nothing"
    recall = len(exact_top5 & approx_pairs) / len(exact_top5)
    assert recall >= 0.2, f"IVF recall collapsed: {recall:.2f}"


def test_ivf_scores_per_cell_not_all_pairs(spark, sf_dir):
    """The IVF path's compute is Σ_cells |Q_c|×|N_c|, NOT |Q|×|N|: the
    per-cell applyInPandas tasks can only score pairs co-resident in a
    cell. Derive the pair count from the same assignment the operator
    uses and pin it well under brute force."""
    from pyspark.sql import functions as F

    from dbbspark.operators.similarity import ivf_assign
    from dbbspark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") % 50 == 0)
    assign = ivf_assign(emb, centroids)
    per_cell = (
        assign.groupBy("centroid_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(((F.col("vid") % 100) == 0).cast("long")).alias("q"),
        )
        .select(F.sum(F.col("q") * F.col("n")).alias("pairs"))
        .collect()[0]
    )
    n_vec = emb.count()
    n_q = emb.where(F.col("vec_id") % 100 == 0).count()
    n_cells = centroids.count()
    brute = n_q * n_vec
    assert per_cell["pairs"] < brute / (n_cells / 4), (
        f"IVF scored {per_cell['pairs']} pairs vs brute {brute} over {n_cells} cells"
    )


def test_brute_force_topk_is_k_per_query(spark, sf_dir):
    cat = load_all()
    rows = cat["q_topk_cosine"].builder(spark, sf_dir).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v == 10 for v in per_q.values()), per_q


def _recall(approx_rows, exact_rows, k=5):
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows if r["rank"] <= k}
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    return len(exact & approx) / len(exact)


def test_trained_centroids_and_multiprobe(spark, sf_dir):
    """The production ANN config: k-means-trained centroids + multi-probe.
    Recall must be monotone in probes, and probing every cell recovers
    exact brute force (each candidate lives in exactly one cell, so the
    probed union is the full corpus)."""
    from pyspark.sql import functions as F

    from dbbspark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_centroids,
    )
    from dbbspark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    n_cells = 8
    cents = train_centroids(emb, k=n_cells, seed=7, max_iter=5)
    assert cents.count() == n_cells

    exact = brute_force_topk(emb, queries, k=5).collect()
    r = {
        p: _recall(
            ivf_topk(emb, queries, cents, k=5, probes=p).collect(), exact
        )
        for p in (1, 2, n_cells)
    }
    assert r[1] > 0, "single-probe IVF found nothing"
    assert r[2] >= r[1], f"recall not monotone in probes: {r}"
    assert r[n_cells] == 1.0, f"probing all cells must be exact: {r}"

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


def test_brute_force_topk_is_k_per_query(spark, sf_dir):
    cat = load_all()
    rows = cat["q_topk_cosine"].builder(spark, sf_dir).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v == 10 for v in per_q.values()), per_q

"""Similarity-search layer (SURVEY.md §2.11 C3).

Query set = every 100th vector; integer-only outputs (ids + rank) so the
oracle compare is immune to last-bit cosine differences — fp only orders,
and cosine gaps (~1e-3) dwarf engine fp noise (~1e-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..operators.similarity import brute_force_topk, ivf_topk
from ..tables import load_table

_COSINE_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
               FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 2000),
    scored AS (
      SELECT q.query_id, n.vec_id AS neighbor_id,
             list_cosine_similarity(q.q_vec, n.embedding) AS sim
      FROM embeddings n CROSS JOIN q
      WHERE n.vec_id != q.query_id)
    SELECT query_id, neighbor_id,
           CAST(rn AS INT) AS rank
    FROM (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 10
"""


@query(
    "q_topk_cosine",
    oracle=_COSINE_TOPK_SQL,
    doc="C3: exact top-10 cosine neighbors per query vector — brute-force "
    "baseline; cosine as zip_with/aggregate expressions (JVM-side), rank "
    "via window. The query panel is FIXED-COUNT (every 100th vector "
    "within the base id range, r12 — the q_interval_join device): with "
    "a proportional panel the row's cost was |Q|·|N| ∝ N²/100 by "
    "construction (measured 2.74× wall for 2× data at the sf2 scale "
    "point), which measured the panel's growth, not the operator; the "
    "pinned panel keeps per-query cost a full corpus scan (the honest "
    "brute baseline ANN recall is judged against) while the row scales "
    "linearly in corpus size. The IVF/PQ rows are the scale path.",
    tags=("similarity", "closure"),
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return brute_force_topk(emb, queries, k=10)


@query(
    "q_ann_ivf",
    oracle="""
    WITH c AS (SELECT vec_id AS centroid_id, embedding AS c_vec
               FROM embeddings WHERE vec_id % 50 = 0),
    assign AS (
      SELECT vid, centroid_id FROM (
        SELECT v.vec_id AS vid, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.embedding, c.c_vec) DESC,
                          c.centroid_id) AS rn
        FROM embeddings v CROSS JOIN c)
      WHERE rn = 1),
    q AS (SELECT a.vid AS query_id, a.centroid_id AS q_cell, e.embedding AS q_vec
          FROM assign a JOIN embeddings e ON e.vec_id = a.vid
          WHERE a.vid % 100 = 0),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             list_cosine_similarity(q.q_vec, v.embedding) AS sim
      FROM embeddings v
      JOIN assign av ON av.vid = v.vec_id
      JOIN q ON av.centroid_id = q.q_cell
      WHERE v.vec_id != q.query_id)
    SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank
    FROM (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    doc="C3: IVF-style approximate NN — vectors assigned to their nearest "
    "deterministic centroid cell (every 50th vector), queries probe only "
    "their own cell. Scored pairs drop |Q|x|N| → |Q|x|N|/cells; recall vs "
    "the exact top-k is pinned in tests/test_similarity.py.",
    tags=("similarity", "closure", "ann"),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") % 50 == 0)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return ivf_topk(emb, queries, centroids, k=5)

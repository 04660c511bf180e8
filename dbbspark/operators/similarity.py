"""Similarity-search operators (SURVEY.md §2.11 C3).

- brute_force_topk: exact cosine top-k per query. The query side is tiny
  (broadcast); cosine is expression-level (zip_with/aggregate fold —
  JVM-side); rank via window. At 100 TB this is the verification baseline
  and the per-cell scorer for IVF.
- ivf_topk: the scale path — vectors are assigned to their nearest
  "centroid" cell once (an embarrassingly-parallel argmax), queries probe
  only their own cell, so scored pairs drop from |Q|×|N| to
  |Q|×|N|/cells. Cells here are seeded deterministically from the data
  (every 50th vector) so the result is reproducible and SQL-checkable; on
  a real cluster the centroids would come from k-means (pyspark.ml) with
  multi-probe to trade recall for cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import cosine


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (query ids ≠ neighbor id). Returns
    (query_id, neighbor_id, rank) — integer output so the compare is
    fp-robust; cosine only orders."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    n = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    scored = n.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (deterministic
    tiebreak on centroid id). One broadcast crossJoin + window argmax —
    linear in |vectors|."""
    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec"))
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v_vec"))
    scored = v.crossJoin(F.broadcast(c)).select(
        "vid", "centroid_id", cosine(F.col("v_vec"), F.col("c_vec")).alias("sim")
    )
    w = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vid", "centroid_id")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's cell.
    Returns (query_id, neighbor_id, rank)."""
    assign = ivf_assign(vectors, centroids, id_col, vec_col)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    ).join(assign.withColumnRenamed("vid", "neighbor_id"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).join(
        assign.withColumnRenamed("vid", "query_id").withColumnRenamed(
            "centroid_id", "q_cell"
        ),
        "query_id",
    )
    scored = v.join(
        F.broadcast(q), F.col("centroid_id") == F.col("q_cell")
    ).where(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    detection. Brute force here (verification baseline); the scale path is
    the same residual check applied after LSH/IVF blocking."""
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(cosine(F.col("a_vec"), F.col("b_vec")) >= threshold)
        .select("vec_a", "vec_b")
    )

"""Dedup-cluster purity audit — "did connected components over-merge?"
(closure operator, SURVEY.md §2.11 C50).

Near-dup clustering is candidate pairs → connected components (C12),
and transitivity is its known failure mode: A~B and B~C chain A into
C's cluster even when Jaccard(A, C) is far below the threshold, so one
promiscuous boilerplate document can weld unrelated clusters and the
keep-one-per-cluster policy then DELETES unrelated documents. This
audit measures that before the delete:

- per member: exact Jaccard between the member and its cluster
  REPRESENTATIVE (the min-id node — which is exactly the component
  label min-label CC produces, and the doc `q_dedup_clusters`-style
  policies keep);
- per cluster: member count + min/avg member-to-rep Jaccard;
- a `suspect` flag for members below a floor (the evidence for
  splitting or re-thresholding before committing the dedup).

Member-to-rep is LINEAR in corpus size (one comparison per member),
not the O(cluster²) of all-pairs purity — the 100 TB-visitable version
of the check. Shapes: one semi-join to restrict shingling to involved
docs, one (component, shingle-hash) equi-join between member and rep
mention streams, two aggregations. No posting arrays, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_docs


def cluster_purity(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    suspect_below: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """(per_member, per_cluster) purity relations.

    ``components`` is the C12 output: (node, component) with component =
    min node id of the cluster. per_member: (component, member,
    jaccard, suspect) for every NON-representative member. per_cluster:
    (component, n_members, min_jaccard, avg_jaccard, n_suspect).
    Singleton clusters (no non-rep members) don't appear — nothing was
    merged, nothing to audit.

    Short documents (< ``shingle_n`` tokens) have empty shingle sets; a
    member-rep pair where BOTH sets are empty is scored by exact text
    identity (byte-identical → 1.0, else 0.0) rather than NULL, so the
    per-cluster min/avg count them and a purity-floor delete policy
    still drops genuinely identical short duplicates.
    """
    comp = components.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )
    involved = comp.select(F.col("node").alias(id_col)).distinct()
    sh = shingle_docs(
        docs.join(involved, id_col, "left_semi"), id_col, text_col, shingle_n
    )
    # distinct shingle hashes per involved doc + per-doc set size
    mentions = sh.select(
        F.col("doc"),
        F.explode(
            F.array_distinct(F.transform("shingles", lambda s: F.xxhash64(s)))
        ).alias("h"),
    )
    sizes = mentions.groupBy("doc").agg(F.count("*").alias("n_sh"))

    # Exact text hash per involved doc: documents shorter than
    # `shingle_n` tokens produce NO shingles, so their member-to-rep
    # comparison would be 0/0. The hash resolves that stratum exactly —
    # byte-identical short docs score 1.0, different ones 0.0 — instead
    # of a NULL that the per-cluster min/avg would silently skip and a
    # purity-floor delete policy would silently retain.
    txt_hash = docs.join(involved, id_col, "left_semi").select(
        F.col(id_col).alias("doc"),
        F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("_th"),
    )

    members = comp.where(F.col("node") != F.col("component"))
    mem_mentions = members.join(
        mentions.withColumnRenamed("doc", "node"), "node"
    ).select("component", F.col("node").alias("member"), "h")
    rep_mentions = (
        comp.select("component").distinct()
        .join(mentions.withColumnRenamed("doc", "component"), "component")
        .select("component", "h")
    )
    inter = (
        mem_mentions.join(rep_mentions.hint("shuffle_merge"), ["component", "h"])
        .groupBy("component", "member")
        .agg(F.count("*").alias("_inter"))
    )
    per_member = (
        members.select("component", F.col("node").alias("member"))
        .join(inter, ["component", "member"], "left")
        .join(
            sizes.select(F.col("doc").alias("member"), F.col("n_sh").alias("_nm")),
            "member",
            "left",
        )
        .join(
            sizes.select(
                F.col("doc").alias("component"), F.col("n_sh").alias("_nr")
            ),
            "component",
            "left",
        )
        .join(
            txt_hash.select(F.col("doc").alias("member"), F.col("_th").alias("_hm")),
            "member",
            "left",
        )
        .join(
            txt_hash.select(
                F.col("doc").alias("component"), F.col("_th").alias("_hr")
            ),
            "component",
            "left",
        )
        .select(
            "component",
            "member",
            F.when(
                # both shingle sets empty (sub-shingle_n docs): decide by
                # exact text identity instead of emitting NULL (0/0)
                F.coalesce(F.col("_nm"), F.lit(0))
                + F.coalesce(F.col("_nr"), F.lit(0))
                == 0,
                F.when(F.col("_hm") == F.col("_hr"), F.lit(1.0)).otherwise(
                    F.lit(0.0)
                ),
            )
            .otherwise(
                F.coalesce(F.col("_inter"), F.lit(0))
                / (
                    F.coalesce(F.col("_nm"), F.lit(0))
                    + F.coalesce(F.col("_nr"), F.lit(0))
                    - F.coalesce(F.col("_inter"), F.lit(0))
                )
            )
            .alias("jaccard"),
        )
        .withColumn("suspect", F.col("jaccard") < F.lit(suspect_below))
    )
    per_cluster = per_member.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min("jaccard").alias("min_jaccard"),
        F.avg("jaccard").alias("avg_jaccard"),
        F.sum(F.col("suspect").cast("long")).alias("n_suspect"),
    )
    return per_member, per_cluster

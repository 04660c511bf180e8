"""A/B micro-variants of jaccard_pairs' pair stage at sf0.1 (warm,
interleaved): (a) current 4-key groupBy; (b) 2-key groupBy carrying
na/nb via first(); (c) positional upper-triangle via posexplode+slice
(generates each pair once instead of df^2-then-filter)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbbspark.session import get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    from dbbspark.operators.dedup import shingle_docs

    spark = get_spark("probe-jacc-var")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    docs = load_table(spark, SF_DIR, "documents")

    def kept():
        sh = shingle_docs(docs, "doc_id", "text", 3)
        mentions = sh.select(
            "doc", F.size("shingles").alias("n_sh"),
            F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("shingle"),
        )
        postings = mentions.groupBy("shingle").agg(
            F.collect_list(F.struct("doc", "n_sh")).alias("ds"))
        return postings.where((F.size("ds") >= 2) & (F.size("ds") <= 1000))

    jac_keep = lambda: None  # noqa: E731

    def v_current():
        inter = (
            kept().select(F.explode("ds").alias("sa"), "ds")
            .select("sa", F.explode("ds").alias("sb"))
            .where(F.col("sa.doc") < F.col("sb.doc"))
            .select(F.col("sa.doc").alias("doc_a"), F.col("sa.n_sh").alias("na"),
                    F.col("sb.doc").alias("doc_b"), F.col("sb.n_sh").alias("nb"))
            .groupBy("doc_a", "doc_b", "na", "nb").agg(F.count("*").alias("inter"))
        )
        jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        return inter.where(jac >= 0.5).select("doc_a", "doc_b")

    def v_firstkey():
        inter = (
            kept().select(F.explode("ds").alias("sa"), "ds")
            .select("sa", F.explode("ds").alias("sb"))
            .where(F.col("sa.doc") < F.col("sb.doc"))
            .select(F.col("sa.doc").alias("doc_a"), F.col("sa.n_sh").alias("na"),
                    F.col("sb.doc").alias("doc_b"), F.col("sb.n_sh").alias("nb"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"), F.first("na").alias("na"),
                 F.first("nb").alias("nb"))
        )
        jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        return inter.where(jac >= 0.5).select("doc_a", "doc_b")

    def v_slice():
        inter = (
            kept().select(F.posexplode("ds").alias("i", "sa"), "ds")
            .select("sa", F.explode(
                F.slice("ds", F.col("i") + 2, F.size("ds"))).alias("sb"))
            .select(
                F.least(F.col("sa.doc"), F.col("sb.doc")).alias("doc_a"),
                F.when(F.col("sa.doc") < F.col("sb.doc"), F.col("sa.n_sh"))
                .otherwise(F.col("sb.n_sh")).alias("na"),
                F.greatest(F.col("sa.doc"), F.col("sb.doc")).alias("doc_b"),
                F.when(F.col("sa.doc") < F.col("sb.doc"), F.col("sb.n_sh"))
                .otherwise(F.col("sa.n_sh")).alias("nb"),
            )
            .where(F.col("doc_a") != F.col("doc_b"))
            .groupBy("doc_a", "doc_b", "na", "nb").agg(F.count("*").alias("inter"))
        )
        jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
        return inter.where(jac >= 0.5).select("doc_a", "doc_b")

    variants = {"current": v_current, "firstkey": v_firstkey, "slice": v_slice}
    base = {tuple(sorted(r)) for r in
            ((r["doc_a"], r["doc_b"]) for r in v_current().collect())}
    for n, fn in list(variants.items())[1:]:
        got = {tuple(sorted(r)) for r in
               ((r["doc_a"], r["doc_b"]) for r in fn().collect())}
        print(n, "pairs equal:", got == base, len(got), len(base))

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    res = {n: [] for n in variants}
    for _ in range(4):
        for n, fn in variants.items():
            spark.sparkContext.setJobDescription(f"var:{n}")
            res[n].append(t(fn()))
    for n in variants:
        print(f"{n:9s} best={min(res[n]):6.3f} all={['%.3f' % x for x in res[n]]}")


if __name__ == "__main__":
    main()

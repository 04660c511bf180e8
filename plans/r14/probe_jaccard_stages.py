"""Substage probe for jaccard_pairs at sf0.1 (it feeds three bench
rows): shingle build vs mention explode vs postings agg vs pair
generation, warm interleaved noop timings."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbbspark.session import get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    from dbbspark.operators.dedup import jaccard_pairs, shingle_docs

    spark = get_spark("probe-jacc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    docs = load_table(spark, SF_DIR, "documents")

    def stage(name):
        sh = shingle_docs(docs, "doc_id", "text", 3)
        if name == "shingles":
            return sh
        mentions = sh.select(
            "doc", F.size("shingles").alias("n_sh"),
            F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("shingle"),
        )
        if name == "mentions":
            return mentions
        postings = mentions.groupBy("shingle").agg(
            F.collect_list(F.struct("doc", "n_sh")).alias("ds"))
        kept = postings.where((F.size("ds") >= 2) & (F.size("ds") <= 1000))
        if name == "postings":
            return kept
        inter = (
            kept.select(F.explode("ds").alias("sa"), "ds")
            .select("sa", F.explode("ds").alias("sb"))
            .where(F.col("sa.doc") < F.col("sb.doc"))
            .select(F.col("sa.doc").alias("doc_a"), F.col("sa.n_sh").alias("na"),
                    F.col("sb.doc").alias("doc_b"), F.col("sb.n_sh").alias("nb"))
            .groupBy("doc_a", "doc_b", "na", "nb").agg(F.count("*").alias("inter"))
        )
        if name == "inter":
            return inter
        return jaccard_pairs(docs, "doc_id", "text", 3, 0.5, 1000)

    names = ["shingles", "mentions", "postings", "inter", "full"]
    res = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            spark.sparkContext.setJobDescription(f"stage:{n}")
            res[n].append(t(stage(n)))
    for n in names:
        print(f"{n:10s} best={min(res[n]):6.3f} all={['%.3f' % x for x in res[n]]}")
    # cardinalities
    sh = shingle_docs(docs, "doc_id", "text", 3)
    mentions = sh.select("doc", F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("h"))
    print("docs:", docs.count(), "mentions:", mentions.count(),
          "distinct shingles:", mentions.select("h").distinct().count())


if __name__ == "__main__":
    main()

"""r14: A/B the jaccard shingle front — build-strings-then-hash vs
hash-token-tuples-directly.

Current front (shingle_docs → transform(xxhash64)): per doc,
array_distinct over ~L 25-byte shingle STRINGS built by concat_ws, then
one xxhash64 per distinct string — all interpreted HOF lambdas. Tokens
are space-free (split on ' '), so concat_ws(' ', t[i..i+n)) is
INJECTIVE on token tuples: hashing the tuple directly
(xxhash64(t_i, t_{i+1}, t_{i+2})) has the same equality classes and
skips every string allocation, moving array_distinct to the long
domain. Collision semantics unchanged in kind (still a 64-bit internal
hash; only its input derivation differs).

Checks pair-set identity at sf0.1, then interleaved timing of the full
jaccard_pairs pipeline (noop) both ways.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPS = 7
N = 3


def tuple_hash_mentions(docs, id_col, text_col, n):
    toks = F.col("__toks")
    n_pos = F.size(toks) - (n - 1)
    idx = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    th = lambda i: F.xxhash64(*[F.element_at(toks, i + k) for k in range(n)])  # noqa: E731
    return (
        docs.select(F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("__toks"))
        .where(F.size("__toks") >= n)
        .select("doc", F.array_distinct(F.transform(idx, th)).alias("hs"))
        .select("doc", F.size("hs").alias("n_sh"), F.explode("hs").alias("shingle"))
    )


def jaccard_pairs_tuplehash(docs, id_col, text_col, shingle_n=3,
                            threshold=0.5, max_df=1000):
    mentions = tuple_hash_mentions(docs, id_col, text_col, shingle_n)
    postings = mentions.groupBy("shingle").agg(
        F.collect_list(F.struct("doc", "n_sh")).alias("ds")
    )
    kept = postings.where(F.size("ds") >= 2)
    if max_df is not None:
        kept = kept.where(F.size("ds") <= max_df)
    inter = (
        kept.select(F.explode("ds").alias("sa"), "ds")
        .select("sa", F.explode("ds").alias("sb"))
        .where(F.col("sa.doc") < F.col("sb.doc"))
        .select(
            F.col("sa.doc").alias("doc_a"),
            F.col("sa.n_sh").alias("na"),
            F.col("sb.doc").alias("doc_b"),
            F.col("sb.n_sh").alias("nb"),
        )
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return inter.where(jac >= threshold).select("doc_a", "doc_b")


def main():
    from dbbspark.operators import dedup as D
    from dbbspark.session import get_spark
    from dbbspark.tables import load_table

    spark = get_spark("probe-shingle-tuplehash")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    docs = load_table(spark, SF_DIR, "documents")

    cur = D.jaccard_pairs(docs, "doc_id", "text", shingle_n=N,
                          threshold=0.5, max_df=1000)
    new = jaccard_pairs_tuplehash(docs, "doc_id", "text", shingle_n=N,
                                  threshold=0.5, max_df=1000)
    a = sorted((r[0], r[1]) for r in cur.collect())
    b = sorted((r[0], r[1]) for r in new.collect())
    print(f"identity: cur={len(a)} new={len(b)} equal={a == b}")
    assert a == b

    # also check the mention stream invariants (n_sh per doc identical)
    old_m = D.shingle_docs(docs, "doc_id", "text", N).select(
        "doc", F.size("shingles").alias("n_sh"))
    new_m = tuple_hash_mentions(docs, "doc_id", "text", N) \
        .select("doc", "n_sh").distinct()
    diff = old_m.join(new_m, "doc").where("old_m.n_sh is null").count() \
        if False else old_m.exceptAll(new_m).count() + new_m.exceptAll(old_m).count()
    print(f"n_sh diff rows: {diff}")
    assert diff == 0

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    res = {"cur": [], "new": []}
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"cur#{i}")
        res["cur"].append(t(D.jaccard_pairs(docs, "doc_id", "text",
                                            shingle_n=N, threshold=0.5,
                                            max_df=1000)))
        spark.sparkContext.setJobDescription(f"new#{i}")
        res["new"].append(t(jaccard_pairs_tuplehash(docs, "doc_id", "text",
                                                    shingle_n=N,
                                                    threshold=0.5,
                                                    max_df=1000)))
    for k, xs in res.items():
        print(f"{k}: " + " ".join("%.3f" % x for x in xs),
              " best=%.3f" % min(xs))


if __name__ == "__main__":
    main()

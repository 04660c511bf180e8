"""r14: A/B the two remaining concat-then-hash gram streams.

Both the LM bigram stream (lm._gram_pairs_col) and the spans 20-gram
mention stream (spans._ngram_mentions) build a concat_ws string per
gram occurrence ONLY to xxhash64 it. xxhash64 hashes token tuples
directly (multi-arg) and arrays (element-sequential) — equality classes
are token-tuple equality, identical to concat_ws(' ') equality because
split-on-' ' tokens are space-free. Hash VALUES change but they are
internal join/groupBy keys on both streams (weights/spans outputs are
functions of gram equality classes only), so outputs are unchanged
modulo the already-accepted 64-bit collision risk.

Interleaved noop timing of each stream, both forms.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPS = 7
N_SPAN = 20


def main():
    from dbbspark.session import get_spark
    from dbbspark.tables import load_table

    spark = get_spark("probe-gram-tuplehash")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.col("doc_id").alias("doc"), F.split("text", " ").alias("__toks")
    )

    # --- LM bigram stream -------------------------------------------
    def lm_stream(tuple_hash: bool):
        t = F.col("__toks")
        n_g = F.size(t) - 1
        empty = F.array().cast("array<string>")
        heads = F.when(n_g >= 1, F.slice(t, 1, n_g)).otherwise(empty)
        tails = F.when(n_g >= 1, F.slice(t, 2, n_g)).otherwise(empty)
        gram = (
            (lambda a, b: F.xxhash64(a, b))
            if tuple_hash
            else (lambda a, b: F.xxhash64(F.concat_ws(" ", a, b)))
        )
        pairs = F.zip_with(
            heads, tails,
            lambda a, b: F.struct(gram(a, b).alias("gram_h"),
                                  F.xxhash64(a).alias("ctx_h")),
        )
        return toks.select("doc", F.explode(pairs).alias("p")) \
                   .select("doc", "p.gram_h", "p.ctx_h") \
                   .groupBy("gram_h").count()

    # --- spans 20-gram mention stream -------------------------------
    def span_stream(array_hash: bool):
        t = F.col("__toks")
        n_grams = F.greatest(F.size(t) - (N_SPAN - 1), F.lit(0))
        h = (
            (lambda i: F.xxhash64(F.slice("__toks", i, N_SPAN)))
            if array_hash
            else (lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice("__toks", i, N_SPAN))))
        )
        grams = F.transform(F.sequence(F.lit(1), n_grams), h)
        m = toks.where(F.size(t) >= N_SPAN).select(
            "doc", F.posexplode(grams).alias("pos", "h"))
        return m.groupBy("h").count()

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    res: dict[str, list[float]] = {}
    for i in range(REPS):
        for name, fn in [
            ("lm_concat", lambda: lm_stream(False)),
            ("lm_tuple", lambda: lm_stream(True)),
            ("span_concat", lambda: span_stream(False)),
            ("span_array", lambda: span_stream(True)),
        ]:
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            res.setdefault(name, []).append(t(fn()))
    for name, xs in res.items():
        print(f"{name:12s} " + " ".join("%.3f" % x for x in xs),
              " best=%.3f" % min(xs))

    # count-multiset identity: same number of distinct grams, same
    # count histogram (hash values differ, classes must not)
    for a, b in [(lm_stream(False), lm_stream(True)),
                 (span_stream(False), span_stream(True))]:
        ha = sorted(r["count"] for r in a.collect())
        hb = sorted(r["count"] for r in b.collect())
        print("classes:", len(ha), len(hb), ha == hb)
        assert ha == hb


if __name__ == "__main__":
    main()

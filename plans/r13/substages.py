#!/usr/bin/env python
"""Sub-stage decomposition probes for the remaining heavy bench rows
(warm best-of-3, noop sink, sf0.1) — guide §1: measure before touching.

usage: substages.py [pack|recon|multi|text|jac|lsh|line]...
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbbspark.session import get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(spark, label, build, n=3):
    best = None
    for _ in range(n + 1):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt if _ > 0 else best  # skip run 0 (cold)
    print(f"  {label:42s} {best:.3f}s", flush=True)


def probe_pack(spark):
    from dbbspark.operators.mixing import epoch_repeats
    from dbbspark.operators.packing import pack_sequences
    from dbbspark.operators.select import budget_select
    from dbbspark.session import cut_lineage

    print("q_pack_sequences sub-stages:")

    def toks_df():
        docs = load_table(spark, SF, "documents")
        return docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
            (F.col("n_chars") % 97).cast("double").alias("score"),
        )

    t(spark, "toks scan+split only", toks_df)
    t(
        spark,
        "pack_sequences alone",
        lambda: pack_sequences(
            toks_df().transform(cut_lineage, eager=False),
            "doc_id", "n_tokens", budget=512, num_buckets=8,
        ),
    )
    t(
        spark,
        "budget_select alone",
        lambda: budget_select(
            toks_df().transform(cut_lineage, eager=False),
            budget=10_000, id_col="doc_id", score_col="score",
            token_col="n_tokens", num_buckets=8,
        ),
    )
    t(
        spark,
        "epoch_repeats+groupBy alone",
        lambda: epoch_repeats(
            load_table(spark, SF, "documents").select("doc_id", "source"),
            {"src0": 2.5, "src1": 0.5, "src2": 3.0},
            default=1.0, epoch_seed=0,
        ).groupBy("doc_id").agg(F.count("*").alias("n_copies")),
    )


def probe_recon(spark):
    from dbbspark.domain import desdm, failures, sispi
    from dbbspark.session import cut_lineage

    print("q_reconcile_anti sub-stages:")

    def both_df():
        s = sispi(spark, SF).select(
            "expnum", "nite", "propid", "obstype", "delivered",
            F.lit(True).alias("_s"),
        )
        d = desdm(spark, SF).select(
            "expnum", F.col("nite").alias("x_nite"),
            F.col("propid").alias("x_propid"),
            F.col("obstype").alias("x_obstype"), F.lit(True).alias("_d"),
        )
        return s.join(d, "expnum", "full")

    t(spark, "full-outer join only", both_df)

    def residuals():
        both = cut_lineage(both_df())
        m = both.where(
            F.col("_s").isNotNull() & F.col("delivered") & F.col("_d").isNull()
        ).join(failures(spark, SF).select("expnum"), "expnum", "left_anti")
        x = both.where(F.col("_d").isNotNull() & F.col("_s").isNull())
        return m.select("expnum").unionByName(x.select("expnum"))

    t(spark, "ckpt + residual filters", residuals)
    from dbbspark.catalog import load_all

    t(spark, "FULL q_reconcile_anti", lambda: load_all()["q_reconcile_anti"].builder(spark, SF))


def probe_multi(spark):
    from dbbspark.operators.phash import (
        dhash_col,
        hamming_ball_stats,
        thumb_variance_col,
        thumbnails,
    )
    from dbbspark.sources.multimodal import decode_media

    print("q_multimodal_decode sub-stages:")

    def hashed_df():
        docs = load_table(spark, SF, "documents").select(
            "doc_id", F.col("text").cast("binary").alias("content")
        )
        decoded = decode_media(docs)
        return thumbnails(decoded, kind="image", on_unregistered="fake").select(
            "doc_id",
            dhash_col("thumb").alias("dhash"),
            F.round(thumb_variance_col("thumb") * 6561).cast("bigint").alias("tv"),
        )

    t(spark, "decode+thumb+dhash only", hashed_df)

    def ball():
        h = hashed_df().select(F.col("doc_id").alias("id"), F.col("dhash").alias("h"))
        return hamming_ball_stats(h, "id", "h", max_distance=4)

    t(spark, "+ hamming_ball_stats (corpus only)", ball)
    from dbbspark.catalog import load_all

    t(spark, "FULL q_multimodal_decode", lambda: load_all()["q_multimodal_decode"].builder(spark, SF))


def probe_text(spark):
    from dbbspark.operators.spans import duplicate_ngram_spans

    print("q_text_stats sub-stages:")
    t(
        spark,
        "duplicate_ngram_spans alone",
        lambda: duplicate_ngram_spans(
            load_table(spark, SF, "documents").select("doc_id", "text"),
            "doc_id", "text", n=5, min_count=2,
        ),
    )
    from dbbspark.catalog import load_all

    t(spark, "FULL q_text_stats", lambda: load_all()["q_text_stats"].builder(spark, SF))


def probe_jac(spark):
    from dbbspark.operators import dedup as D

    print("q_near_dedup_jaccard sub-stages:")
    docs = load_table(spark, SF, "documents")
    t(
        spark,
        "shingle+postings (no pairs)",
        lambda: D.shingle_docs(docs, "doc_id", "text", 3)
        .select(
            "doc",
            F.explode(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("shingle"),
        )
        .groupBy("shingle")
        .agg(F.count("*").alias("c")),
    )
    t(
        spark,
        "FULL jaccard_pairs",
        lambda: D.jaccard_pairs(docs, "doc_id", "text", 3, 0.5, 1000),
    )


def probe_lsh(spark):
    from dbbspark.operators import dedup as D

    print("q_minhash_lsh sub-stages:")
    docs = load_table(spark, SF, "documents")
    t(
        spark,
        "FULL lsh_candidate_pairs_direct",
        lambda: D.lsh_candidate_pairs_direct(docs, "doc_id", "text", 4, 4),
    )


def probe_line(spark):
    from dbbspark.operators.lines import dedup_lines

    print("q_line_dedup:")
    docs = load_table(spark, SF, "documents")
    t(
        spark,
        "FULL dedup_lines",
        lambda: dedup_lines(docs.select("doc_id", "text"), "doc_id", "text", min_df=2),
    )


PROBES = {
    "pack": probe_pack,
    "recon": probe_recon,
    "multi": probe_multi,
    "text": probe_text,
    "jac": probe_jac,
    "lsh": probe_lsh,
    "line": probe_line,
}


def main():
    spark = get_spark("dbbspark-substages")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in sys.argv[1:] or list(PROBES):
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()

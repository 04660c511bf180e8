#!/usr/bin/env python
"""Interleaved A/B for q_multimodal_decode's join-back shape: id-keyed
hamming_ball_stats output (re-derives the 3-leg hash union in the
final plan: 4 checkpoint reads + 2 joins) vs the by_hash relation
joined on the dhash already in hand (1 read + 1 join). Value equality
checked (5000/5000); quiet-window A/B best 1.794 -> 1.690 s, noisy
window within noise - adopted for the scale shape (the checkpoint
relation is corpus-sized at 100 TB; 4 reads -> 1).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from dbbspark.catalog import load_all
from dbbspark.session import get_spark, cut_lineage
from dbbspark.tables import load_table
from dbbspark.operators.phash import (
    decode_and_thumbnails, dhash_col, thumb_variance_col, hamming_ball_stats)
from dbbspark.queries.multimodal import _TWIN_OFFSET
spark = get_spark("ab-mm2")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()
spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()
SF = "/root/testdata/sf0.1"

def common():
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content"))
    hashed = (
        decode_and_thumbnails(docs, kind="image", on_unregistered="fake")
        .select("doc_id",
                F.col("decoded.width").alias("width"),
                F.col("decoded.height").alias("height"),
                F.col("decoded.n_frames").alias("n_frames"),
                dhash_col("thumb").alias("dhash"),
                F.round(thumb_variance_col("thumb") * 6561).cast("bigint").alias("thumb_var_x6561"),
                "thumb")
        .select("doc_id", "width", "height", "n_frames", "dhash", "thumb_var_x6561",
                F.expr("(dhash & -2) | (CASE WHEN element_at(thumb, 1) + 1.0D >"
                       " element_at(thumb, 2) THEN 1L ELSE 0L END)").alias("twin_hash"),
                F.expr("(dhash & -4)"
                       " | (CASE WHEN element_at(thumb, 1) >"
                       " element_at(thumb, 2) + 1.0D THEN 1L ELSE 0L END)"
                       " | (CASE WHEN element_at(thumb, 2) + 1.0D >"
                       " element_at(thumb, 3) THEN 2L ELSE 0L END)").alias("twin2_hash")))
    hashed = cut_lineage(hashed)
    corpus = hashed.select(F.col("doc_id").alias("id"), F.col("dhash").alias("h"))
    twins = hashed.select((F.col("doc_id") + _TWIN_OFFSET).alias("id"), F.col("twin_hash").alias("h"))
    twins2 = hashed.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2 * _TWIN_OFFSET).alias("id"), F.col("twin2_hash").alias("h"))
    u = corpus.unionByName(twins).unionByName(twins2)
    return hashed, u

OUT = ["doc_id", "width", "height", "n_frames", "dhash", "thumb_var_x6561", "n_near", "n_group"]

def build_old():
    hashed, u = common()
    stats = hamming_ball_stats(u, "id", "h", max_distance=4)
    return hashed.join(stats, hashed.doc_id == stats.id).select(*OUT)

def build_new():
    hashed, u = common()
    stats = hamming_ball_stats(u, "id", "h", max_distance=4, by_hash=True)
    return hashed.join(stats, hashed.dhash == stats.h).select(*OUT)

a = sorted(map(tuple, build_old().collect()))
b = sorted(map(tuple, build_new().collect()))
print("equal:", a == b, len(a), len(b))
res = {"old": [], "new": []}
for _ in range(5):
    for n, bld in (("old", build_old), ("new", build_new)):
        t0 = time.perf_counter()
        bld().write.format("noop").mode("overwrite").save()
        res[n].append(time.perf_counter() - t0)
for n, xs in res.items():
    print(f"{n} best={min(xs):.3f} all={['%.3f' % x for x in xs]}")

#!/usr/bin/env python
"""q_embed_near_dup shape probe: cosine_pairs_above_blocked builds its
block-pair assignment with TWO broadcast joins against a (bi, bj) pair
relation (two parquet scans of the vector table, a union, then the
groupBy shuffle).  The same assignment is a per-row computed ARRAY of
(bi, bj, side) structs exploded off ONE scan — no joins, no union, and
the unused diagonal side=1 copies (emit() ignores side=1 when bi==bj)
are never shipped at all.

Checks exact pair-set equality and interleaved warm A/B timings.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbbspark.session import get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
B = 8
THRESHOLD = 0.45


def build_current(spark):
    from dbbspark.operators.similarity import cosine_pairs_above_blocked

    emb = load_table(spark, SF_DIR, "embeddings")
    return cosine_pairs_above_blocked(emb, THRESHOLD)


def build_explode(spark):
    import numpy as np
    import pandas as pd

    from dbbspark.operators.similarity import _unit

    emb = load_table(spark, SF_DIR, "embeddings")
    id_col, vec_col = "vec_id", "embedding"
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(B)).alias("blk"),
    )
    idx = F.sequence(F.lit(0), F.lit(B - 1))
    left_entries = F.transform(
        F.filter(idx, lambda j: j >= F.col("blk")),
        lambda j: F.struct(
            F.col("blk").cast("int").alias("bi"),
            j.cast("int").alias("bj"),
            F.lit(0).alias("side"),
        ),
    )
    right_entries = F.transform(
        F.filter(idx, lambda i: i < F.col("blk")),
        lambda i: F.struct(
            i.cast("int").alias("bi"),
            F.col("blk").cast("int").alias("bj"),
            F.lit(1).alias("side"),
        ),
    )
    exploded = v.select(
        "vid",
        "vec",
        F.explode(F.concat(left_entries, right_entries)).alias("e"),
    ).select(
        F.col("e.bi").alias("bi"),
        F.col("e.bj").alias("bj"),
        "vid",
        "vec",
        F.col("e.side").alias("side"),
    )

    def emit(key, pdf):
        bi, bj = key
        a = pdf[pdf["side"] == 0]
        b = a if bi == bj else pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        A = np.stack(a["vec"].to_numpy()).astype(np.float64)
        Bm = A if bi == bj else np.stack(b["vec"].to_numpy()).astype(
            np.float64
        )
        An = _unit(A)
        Bn = An if bi == bj else _unit(Bm)
        sims = An @ Bn.T
        ia, ib = np.nonzero(sims >= THRESHOLD)
        ids_a = a["vid"].to_numpy()[ia]
        ids_b = b["vid"].to_numpy()[ib]
        if bi == bj:
            keep = ids_a < ids_b
            return pd.DataFrame(
                {"vec_a": ids_a[keep], "vec_b": ids_b[keep]}
            )
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids_a, ids_b),
                "vec_b": np.maximum(ids_a, ids_b),
            }
        )

    return exploded.groupBy("bi", "bj").applyInPandas(
        emit, "vec_a long, vec_b long"
    )


def main():
    spark = get_spark("probe-embnd")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    cur = sorted(map(tuple, build_current(spark).collect()))
    new = sorted(map(tuple, build_explode(spark).collect()))
    print(f"pairs cur={len(cur)} new={len(new)} equal={cur == new}")
    if cur != new:
        return

    def t(build):
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    res = {"current": [], "explode": []}
    for _ in range(5):
        res["current"].append(t(build_current))
        res["explode"].append(t(build_explode))
    for n, xs in res.items():
        print(f"{n:8s} best={min(xs):6.3f} all={['%.3f' % x for x in xs]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""q_embed_normalize `normed` leg: CollapseProject inlines the __norm
alias (referenced once) into the l2 transform lambda, so the whole
sqrt(Σx²) aggregate re-evaluates PER ARRAY ELEMENT in the interpreted
lambda — a 64× blow-up measured at 0.82 s for 2000×64 doubles.

Writing the fold as (x/__norm)*(x/__norm) references the alias twice,
which CollapseProject refuses to duplicate — __norm stays a per-row
projected column. Values are bit-identical: v = x/n is deterministic
IEEE division, so v*v == (x/n)*(x/n), and the fold order is unchanged.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbbspark.session import get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def norm_col():
    return F.sqrt(
        F.aggregate(
            F.transform(F.col("e"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def build_current(spark):
    e = emb(spark)
    l2 = F.transform(F.col("e"), lambda x: x / F.col("__norm"))
    nm = e.withColumn("__norm", norm_col()).select("vec_id", l2.alias("l2"))
    norm_sq = F.aggregate(
        F.transform(F.col("l2"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return nm.select("vec_id", F.round(norm_sq, 6).alias("norm_sq"))


def build_pinned(spark):
    e = emb(spark)
    nm = e.withColumn("__norm", norm_col())
    norm_sq = F.aggregate(
        F.transform(
            F.col("e"),
            lambda x: (x / F.col("__norm")) * (x / F.col("__norm")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return nm.select("vec_id", F.round(norm_sq, 6).alias("norm_sq"))


def main():
    spark = get_spark("probe-norm")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    cur = build_current(spark).orderBy("vec_id").collect()
    new = build_pinned(spark).orderBy("vec_id").collect()
    exact = all(a == b for a, b in zip(cur, new)) and len(cur) == len(new)
    print(f"rows={len(cur)} exact_equal={exact}")
    plan = build_pinned(spark)._jdf.queryExecution().executedPlan().toString()
    # the aggregate must appear ONCE (the norm projection), not inside
    # the outer fold's lambda
    print("plan sqrt occurrences:", plan.count("SQRT"))
    if not exact:
        return

    def t(build):
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    res = {"current": [], "pinned": []}
    for _ in range(5):
        res["current"].append(t(build_current))
        res["pinned"].append(t(build_pinned))
    for n, xs in res.items():
        print(f"{n:8s} best={min(xs):6.3f} all={['%.3f' % x for x in xs]}")


if __name__ == "__main__":
    main()

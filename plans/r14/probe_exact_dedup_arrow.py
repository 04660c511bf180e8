"""A/B probe: q_exact_dedup with the C28 classifier margin computed by
one Arrow pass (hashlib md5 + exact int weight arithmetic + the same
left-fold float addition order → bit-identical margins) vs the current
interpreted-HOF expression chain. Also substage-decomposes the row."""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402

from dbbspark.session import get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

_NONPRINT = re.compile(r"[^ -~]")
_SPLIT = re.compile(r"[^a-z0-9]+")


def _margin_batch(text: pd.Series) -> pd.Series:
    import hashlib

    md5 = hashlib.md5
    memo: dict[str, float] = {}

    def w(g: str) -> float:
        v = memo.get(g)
        if v is None:
            h = int(md5(g.encode()).hexdigest()[:15], 16)
            v = ((h % 4096) * 2654435761 % 2000003 - 1000001) / 1000001.0 * 0.01
            if len(memo) < 1_000_000:
                memo[g] = v
        return v

    out = []
    for t in text.tolist():
        if t is None:
            out.append(None)
            continue
        toks = [x for x in _SPLIT.split(_NONPRINT.sub(" ", t).lower()) if x]
        if len(toks) >= 2:
            grams = toks + [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
        else:
            grams = toks
        acc = 0.0
        for g in grams:
            acc += w(g)
        out.append(acc)
    return pd.Series(out, dtype="float64")


margin_udf = F.pandas_udf(_margin_batch, T.DoubleType())


def build_arrow(spark):
    from dbbspark.operators import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    kept = D.sha_dedup_keep_first(docs, "text", "doc_id")
    m = kept.select(
        "doc_id", "text", margin_udf(F.col("text")).alias("clf_score_margin")
    )
    return m.select(
        "doc_id",
        F.sha2(F.col("text").cast("binary"), 256).alias("sha"),
        F.round("clf_score_margin", 6).alias("clf_margin"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("clf_score_margin"))), 6
        ).alias("clf_score"),
    )


def build_dedup_only(spark):
    from dbbspark.operators import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    kept = D.sha_dedup_keep_first(docs, "text", "doc_id")
    return kept.select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("sha")
    )


def main():
    from dbbspark.catalog import load_all

    spark = get_spark("probe-exact-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    catalog = load_all()

    cur = catalog["q_exact_dedup"].builder(spark, SF_DIR)
    new = build_arrow(spark)
    assert cur.schema == new.schema, f"\n{cur.schema}\n{new.schema}"
    a = {r["doc_id"]: r for r in cur.collect()}
    b = {r["doc_id"]: r for r in new.collect()}
    assert set(a) == set(b)
    bad = [k for k in a if a[k] != b[k]]
    print(f"value check: {len(a)} rows, {len(bad)} mismatches")
    for k in bad[:3]:
        print("MISMATCH", a[k], b[k])
    if bad:
        return

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "current": lambda: catalog["q_exact_dedup"].builder(spark, SF_DIR),
        "arrow": lambda: build_arrow(spark),
        "dedup_only": lambda: build_dedup_only(spark),
    }
    results = {k: [] for k in variants}
    for _ in range(4):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}")
            results[name].append(t(fn()))
    for name, rs in results.items():
        print(f"{name:10s} best={min(rs):6.3f}  all={['%.3f' % r for r in rs]}")


if __name__ == "__main__":
    main()

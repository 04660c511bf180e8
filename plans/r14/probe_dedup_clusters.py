"""Substage probe for q_dedup_clusters' driver regime (VERDICT r13
item 2): time ckpt materialization vs bounded collect vs jmap purity
scan vs final assembly, warm, interleaved with the full row."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbbspark.session import cut_lineage, get_spark  # noqa: E402
from dbbspark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    from dbbspark.catalog import load_all
    from dbbspark.operators import dedup as D
    from dbbspark.operators.audit import member_rep_jaccard_map
    from dbbspark.operators.dedup import md5_int_py

    spark = get_spark("probe-dedup-clusters")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    catalog = load_all()

    def t(fn):
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    for rep in range(3):
        docs = load_table(spark, SF_DIR, "documents")
        pairs = D.jaccard_pairs(docs, "doc_id", "text", shingle_n=3,
                                threshold=0.5, max_df=1000)
        e = (pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
             .where(F.col("doc_a") != F.col("doc_b")))
        dt_ckpt, e2 = t(lambda: cut_lineage(e, eager=True))
        dt_probe, probe = t(lambda: e2.limit(2_000_001).collect())
        und = [(r["u"], r["v"]) for r in probe]

        def cc_pr():
            from dbbspark.operators.dedup import union_find_components
            from dbbspark.operators.graph import pagerank_numpy
            comp = dict(union_find_components(und))
            ranks = pagerank_numpy(und + [(b, a) for a, b in und], 0.85, 3,
                                   tol=0.0, scaled=True)
            return sorted((n, c, ranks[n]) for n, c in comp.items())

        dt_py, rows = t(cc_pr)
        stratum = [(n, c) for n, c, _r in rows
                   if n != c and md5_int_py("purity-v1" + str(n)) % 100 < 25]
        comp_rows = [{"node": n, "component": c} for n, c in stratum]
        comp_rows += [{"node": c, "component": c} for c in {c for _n, c in stratum}]
        dt_jmap, jmap = t(lambda: member_rep_jaccard_map(docs, comp_rows,
                                                         "doc_id", "text", 3))
        print(f"rep{rep}: edges={len(und)} stratum={len(stratum)} "
              f"ckpt={dt_ckpt:.3f} probe={dt_probe:.3f} py={dt_py:.3f} "
              f"jmap={dt_jmap:.3f}")

        # full row for reference
        t0 = time.perf_counter()
        catalog["q_dedup_clusters"].builder(spark, SF_DIR).write \
            .format("noop").mode("overwrite").save()
        print(f"rep{rep}: full_row={time.perf_counter() - t0:.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Warm best-of-N standalone probe of named queries (the BASELINE.md
fold-budget methodology): one session, noop sink, plan rebuilt per run.

usage: probe.py q_a,q_b [n_runs=3]
env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dbbspark.catalog import load_all  # noqa: E402
from dbbspark.session import get_spark  # noqa: E402


def main() -> None:
    names = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    catalog = load_all()
    spark = get_spark("dbbspark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in names:
        runs = []
        for _ in range(n + 1):  # first run warms; report best of the rest
            t0 = time.perf_counter()
            catalog[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: warm_best={min(runs[1:])} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

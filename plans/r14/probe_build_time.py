#!/usr/bin/env python
"""Split each bench row into CONSTRUCTION (builder call: py4j Column
round-trips, Catalyst analysis, any eager driver-regime jobs) vs
EXECUTION (the noop save) — plan-build time is inside the driver's
timed region (bench.py rebuilds plans per run), so a query whose
construction dominates is a py4j/driver-job target, not a data target.

Usage: python plans/r14/probe_build_time.py [min_seconds_filter]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from dbbspark.catalog import load_all  # noqa: E402
from dbbspark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main():
    floor = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    spark = get_spark("probe-build")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    catalog = load_all()
    rows = []
    for name in sorted(catalog):
        build_t, exec_t = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            df = catalog[name].builder(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_t.append(t1 - t0)
            exec_t.append(t2 - t1)
        rows.append((name, min(build_t), min(exec_t)))
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':28s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name, b, e in rows:
        if b + e < floor:
            continue
        print(f"{name:28s} {b:7.3f} {e:7.3f} {b + e:7.3f}")
    print("sum build:", round(sum(r[1] for r in rows), 2),
          "sum exec:", round(sum(r[2] for r in rows), 2))


if __name__ == "__main__":
    main()

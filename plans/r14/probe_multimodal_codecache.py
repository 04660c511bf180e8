"""VERDICT r13 item 4: decompose q_multimodal_decode's standalone-vs-
in-bench gap. In ONE fresh process: (1) warm standalone best-of-3,
(2) run one full catalog pass (the bench's context), (3) re-time the
query. To repeat with a bigger JIT code cache, launch with
PYSPARK_SUBMIT_ARGS='--driver-java-options
-XX:ReservedCodeCacheSize=512m pyspark-shell' (applies at JVM start)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main():
    from dbbspark.catalog import load_all
    from dbbspark.session import get_spark

    spark = get_spark("probe-mm-codecache")
    print("PYSPARK_SUBMIT_ARGS:", os.environ.get("PYSPARK_SUBMIT_ARGS"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    catalog = load_all()

    def run(name):
        t0 = time.perf_counter()
        catalog[name].builder(spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        return time.perf_counter() - t0

    pre = [run("q_multimodal_decode") for _ in range(3)]
    print("standalone warm:", ["%.3f" % x for x in pre], "best=%.3f" % min(pre))
    t0 = time.perf_counter()
    for name in sorted(catalog):
        run(name)
    print("full pass: %.1f s" % (time.perf_counter() - t0))
    post = [run("q_multimodal_decode") for _ in range(3)]
    print("after pass:", ["%.3f" % x for x in post], "best=%.3f" % min(post))


if __name__ == "__main__":
    main()

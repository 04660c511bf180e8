#!/usr/bin/env python
"""r13 scale A/B probes at the sf1 (10x) fixture — measurement only.

Two modes, selected by $PROBE_MODE:

codec  — one fresh process per invocation; $PROBE_CODEC in {lz4,zstd}
         sets spark.io.compression.codec for the whole session (core
         conf, cannot toggle in-session — callers alternate processes
         ABBA to cancel window drift). Times the three
         shuffle-heaviest catalog rows warm (1 warm + 2 timed runs per
         query, min recorded), noop sink, prints one JSON line.

bloom  — ONE session; toggles the runtime bloom-filter SQL confs
         per-run (runtime confs, in-session interleave ABAB x3) on
         q_big_join with creation/application thresholds scaled down
         to fixture size (the 10 GB application-side default can never
         be met by a 167 MB local fixture; at 100 TB the defaults are
         met naturally, so the probe measures the mechanism at the
         fixture's proportions). Also records whether the bloom filter
         actually appears in the optimized plan.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dbbspark.catalog import load_all  # noqa: E402
from dbbspark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")
MODE = os.environ["PROBE_MODE"]


def _time_query(spark, builder, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    catalog = load_all()
    if MODE == "codec":
        codec = os.environ["PROBE_CODEC"]
        os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
        from pyspark.sql import SparkSession

        from dbbspark.session import apply_runtime_confs

        cpus = int(os.environ["SPARK_GRAFT_CPUS"])
        spark = apply_runtime_confs(
            SparkSession.builder.appName(f"probe-codec-{codec}")
            .master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            .config("spark.io.compression.codec", codec)
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).count()
        out = {"mode": "codec", "codec": codec, "sf_dir": SF_DIR, "queries": {}}
        for q in ("q_big_join", "q_text_stats", "q_near_dedup_jaccard"):
            b = catalog[q].builder
            _time_query(spark, b, n=1)  # warm (JIT + page cache)
            out["queries"][q] = round(_time_query(spark, b, n=2), 3)
        print(json.dumps(out))
        return

    if MODE == "bloom":
        spark = get_spark("probe-bloom")
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).count()
        b = catalog["q_big_join"].builder
        # Both arms disable auto-broadcast: at fixture scale the filtered
        # lineitem side LOOKS broadcastable, so InjectRuntimeFilter
        # declines (it only fires for probably-shuffle joins; the merge
        # hint pins SMJ in physical planning but the rule sizes the join
        # without it). At 100 TB neither side fits broadcast and the rule
        # fires with stock thresholds. The merge hint keeps the executed
        # join SMJ in both arms either way, so the arms differ only by
        # the bloom filter.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ON = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # fixture-proportional thresholds: creationSideThreshold is
            # a MAX (build side must fit under it) — keep it roomy;
            # applicationSideScanSizeThreshold is a MIN (probe side must
            # be big) — the 10GB default can never be met by a 167 MB
            # fixture, so scale it down
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "64KB",
        }
        OFF = {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}

        def set_confs(d):
            for k, v in d.items():
                spark.conf.set(k, v)

        set_confs(ON)
        plan_on = b(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
        bloom_in_plan = "bloom" in plan_on.lower() or "BloomFilter" in plan_on
        _time_query(spark, b, n=1)  # warm
        set_confs(OFF)
        _time_query(spark, b, n=1)  # warm other arm
        res = {"on": [], "off": []}
        for _ in range(3):  # interleaved ABAB
            set_confs(ON)
            res["on"].append(round(_time_query(spark, b, n=1), 3))
            set_confs(OFF)
            res["off"].append(round(_time_query(spark, b, n=1), 3))
        print(
            json.dumps(
                {
                    "mode": "bloom",
                    "sf_dir": SF_DIR,
                    "bloom_in_optimized_plan": bloom_in_plan,
                    "runs": res,
                    "min_on": min(res["on"]),
                    "min_off": min(res["off"]),
                }
            )
        )
        return

    raise SystemExit(f"unknown PROBE_MODE {MODE}")


if __name__ == "__main__":
    main()

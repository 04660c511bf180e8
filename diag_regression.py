#!/usr/bin/env python
"""Bisect the scan-split confs, de-confounded: regimes interleave within
each pass (A,B,C,A,B,C,...) so an interference burst hits all regimes
equally; 4 passes, min per (query, regime)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbbspark.catalog import load_all  # noqa: E402
from dbbspark.session import get_spark  # noqa: E402

QUERIES = [
    "q_embed_near_dup",
    "q_embed_normalize",
    "q_interval_join",
    "q_near_dedup_jaccard",
    "q_pack_sequences",
    "q_dedup_clusters",
]

REGIMES = {
    "A_r3": {
        "spark.sql.files.minPartitionNum": "32",
        "spark.sql.files.openCostInBytes": str(128 * 1024),
    },
    "B_default": {
        "spark.sql.files.minPartitionNum": "UNSET",
        "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
    },
    "C_mid": {
        "spark.sql.files.minPartitionNum": "8",
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
    },
}


def set_regime(spark, confs):
    for k, v in confs.items():
        if v == "UNSET":
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    catalog = load_all()
    spark = get_spark("diag-regression")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, list[float]]] = {
        q: {r: [] for r in REGIMES} for q in QUERIES
    }
    for _pass in range(4):
        for regime, confs in REGIMES.items():
            set_regime(spark, confs)
            for name in QUERIES:
                t0 = time.perf_counter()
                catalog[name].builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name][regime].append(round(time.perf_counter() - t0, 3))
    summary = {
        q: {r: {"min": min(v), "all": v} for r, v in d.items()}
        for q, d in out.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

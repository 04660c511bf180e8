#!/usr/bin/env python
"""Capture .explain('formatted') for every declared query into
plans/r14/<query>_<tag>.txt (tag = before/after, argv[1]).

Optional argv[2]: comma list of query names (default: all).
Also writes a one-line-per-query summary (Exchange count, join nodes,
Python eval nodes, scans) to plans/r14/summary_<tag>.tsv.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from dbbspark.catalog import load_all  # noqa: E402
from dbbspark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = None
    if len(sys.argv) > 2 and sys.argv[2].strip():
        only = {q.strip() for q in sys.argv[2].split(",") if q.strip()}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    catalog = load_all()
    spark = get_spark("dbbspark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(catalog):
        if only is not None and name not in only:
            continue
        df = catalog[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        counts = {
            "exchange": len(re.findall(r"\bExchange\b", plan)),
            "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
            "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
            "py": len(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"MapInArrow|FlatMapGroupsInPandas)\b",
                    plan,
                )
            ),
            "scan": len(re.findall(r"\bScan parquet\b", plan)),
            "sort": len(re.findall(r"^\(\d+\) Sort\b", plan, re.M)),
            "window": len(re.findall(r"\bWindow\b", plan)),
            "rows_est": "",
        }
        rows.append((name, counts))
        print(name, counts, flush=True)
    with open(os.path.join(out_dir, f"summary_{tag}.tsv"), "w") as f:
        f.write(
            "query\texchange\tsmj\tbhj\tshj\tbnlj\tpy\tscan\tsort\twindow\n"
        )
        for name, c in rows:
            f.write(
                f"{name}\t{c['exchange']}\t{c['smj']}\t{c['bhj']}\t"
                f"{c['shj']}\t{c['bnlj']}\t{c['py']}\t{c['scan']}\t"
                f"{c['sort']}\t{c['window']}\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()

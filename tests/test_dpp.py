"""Dynamic partition pruning (SURVEY.md §4): a fact table partitioned on
the join key must scan ONLY the partitions the filtered dimension
selects — at 100 TB the difference between touching 3 date partitions
and all 3000. The plan must carry a dynamicpruning subquery on the fact
scan, and the answer must match the unpartitioned run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dpp")
    fact = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 20).alias("day"),
        (F.col("id") * 3 % 997).alias("val"),
    )
    fact.write.partitionBy("day").parquet(str(root / "fact"))
    dim = spark.createDataFrame(
        [(d, "keep" if d in (3, 7) else "drop") for d in range(20)],
        "day long, tag string",
    )
    dim.write.parquet(str(root / "dim"))
    return root


def _join(spark, warehouse):
    fact = spark.read.parquet(str(warehouse / "fact"))
    dim = spark.read.parquet(str(warehouse / "dim")).where(F.col("tag") == "keep")
    return fact.join(dim, "day").groupBy("day").agg(F.sum("val").alias("total"))


def test_dpp_subquery_in_plan(spark, warehouse):
    df = _join(spark, warehouse)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_dpp_answer_matches_broadcast_filter(spark, warehouse):
    df = _join(spark, warehouse)
    got = {(r["day"], r["total"]) for r in df.collect()}
    fact = spark.read.parquet(str(warehouse / "fact"))
    want = {
        (r["day"], r["total"])
        for r in fact.where(F.col("day").isin(3, 7))
        .groupBy("day")
        .agg(F.sum("val").alias("total"))
        .collect()
    }
    assert got == want and len(got) == 2

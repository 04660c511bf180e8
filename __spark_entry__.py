"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the dbbspark query catalog (dbbspark/catalog.py). Each
declared query implements one operator row of SURVEY.md §2; oracle SQL is
kept next to each builder in dbbspark/queries/*.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbbspark.catalog import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the per-nite reconciliation summary (SURVEY.md §7
    step 1) — nite bucketing + anti-join missing/extra + grouped counts —
    on /root/testdata/sf0.001."""
    catalog = load_all()
    return catalog["q_group_count"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible declared query;
    non-SQL-expressible ops are omitted (driver does a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }

"""Fixture-table loading.

The driver materializes TPC-H-ish parquet tables plus `events`, `documents`,
`embeddings` (TESTDATA.md / FIXTURES.md). This module is the single place
that knows how to read them:

- `events.ts` is parquet TIMESTAMP(NANOS); with
  `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a long which we
  convert back to TimestampType by truncating to microseconds — the same
  truncation DuckDB applies when casting TIMESTAMP_NS to its microsecond
  TIMESTAMP, so Spark and the oracle see identical values.

At 100 TB these reads become partitioned-table scans; nothing here collects
to the driver, and the nanos conversion is a single projected expression
(whole-stage-codegen'd, no UDF).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=64)
def _nanos_columns(sf_dir: str, name: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] for this file (pyarrow probe)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    schema = pq.read_schema(f"{sf_dir}/{name}.parquet")
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, restoring timestamp types as needed."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _nanos_columns(sf_dir, name):
        # nanos → micros truncation (matches DuckDB's ns→us cast); integer
        # `div`, NOT `/` — double division rounds the low microsecond bit.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Bucketed-table co-location (SURVEY.md §7 scale pass; ingest J8 at
scale).

The ingest duplicate gate anti-joins every incoming batch against the
registry on `filename`. At billions of registry rows that is a full
shuffle of the registry per batch. Bucketing the registry by the join key
persists its hash-partitioning in the catalog, so the join plan shuffles
ONLY the (small) incoming side — the registry is read already co-located.

This is Spark's answer to the reference's DB index on filename
(`is_file_in_archive`, bin/save_DBB_stagein_to_DBB.py:155).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a table bucketed (and sorted) by ``bucket_col``
    (one column or a composite key, e.g. the banded hash index's
    ["band", "val"]). Bucket count is fixed at creation — size it for
    the table's target scale (e.g. 4096 for a billions-of-rows
    registry), not its first batch."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    (
        df.write.mode(mode)
        .bucketBy(buckets, *cols)
        .sortBy(*cols)
        .saveAsTable(table)
    )


def anti_join_bucketed(
    spark: SparkSession, incoming: DataFrame, table: str, key: str
) -> DataFrame:
    """incoming ∖ table on ``key`` — new-keys-only gate. With ``table``
    bucketed on ``key``, only `incoming` shuffles."""
    return incoming.join(spark.table(table), key, "left_anti")

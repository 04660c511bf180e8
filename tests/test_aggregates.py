"""Accuracy bounds for the approximate sketches (no exact oracle possible —
the driver records a rows-only check; this pins the error instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.catalog import load_all


def test_approx_distinct_within_5pct(spark, sf_dir):
    cat = load_all()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in cat["q_approx_distinct"].builder(spark, sf_dir).collect()
    }
    from dbbspark.tables import load_table

    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(1, 0.05 * ex), (et, approx[et], ex)

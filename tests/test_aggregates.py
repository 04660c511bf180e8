"""Accuracy bounds for the approximate sketches (no exact oracle possible —
the driver records a rows-only check; this pins the error instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.catalog import load_all


def test_approx_distinct_within_5pct(spark, sf_dir):
    # the declared query emits within-10% booleans (driver-hashable);
    # they must all hold, and the raw sketch must be within 5% here.
    cat = load_all()
    rows = cat["q_approx_distinct"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_users_ok"], r
        assert r["approx_median_ok"], r

    from dbbspark.tables import load_table

    both = {
        r["event_type"]: (r["approx"], r["exact"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    for et, (ap, ex) in both.items():
        assert abs(ap - ex) <= max(1, 0.05 * ex), (et, ap, ex)

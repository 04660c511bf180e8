"""The gaps-and-islands session query must agree with Spark's native
session_window operator — pins the oracle's session semantics to the
engine the streaming front-end actually uses."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbbspark.catalog import load_all
from dbbspark.tables import load_table


def test_session_window_matches_native(spark, sf_dir):
    cat = load_all()
    ours = {
        (r["user_id"], r["session_start"], r["session_end"], r["cnt"])
        for r in cat["q_session_window"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    native = {
        (r["user_id"], r["w"]["start"], r["w"]["end"], r["cnt"])
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert ours == native

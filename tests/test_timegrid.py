"""Time-grid densification (operators/timegrid.py, SURVEY.md §2.11 C48)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dbbspark.operators.timegrid import fill_time_gaps


def _ts(d):
    return datetime.datetime(2024, 1, d)


def test_numeric_gaps_filled_with_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 5), (5, 7)], "bucket long, cnt long"
    )
    out = {
        r["bucket"]: r["cnt"]
        for r in fill_time_gaps(df, "bucket", F.lit(1), fill={"cnt": 0}).collect()
    }
    assert out == {1: 10, 2: 5, 3: 0, 4: 0, 5: 7}


def test_timestamp_daily_spine_per_group(spark):
    rows = [
        ("a", _ts(1), 3),
        ("a", _ts(4), 1),
        ("b", _ts(2), 9),  # single-bucket group
    ]
    df = spark.createDataFrame(rows, "g string, day timestamp, cnt long")
    out = fill_time_gaps(
        df, "day", "INTERVAL 1 DAY", group_cols=["g"], fill={"cnt": 0}
    ).collect()
    got = {(r["g"], r["day"].day): r["cnt"] for r in out}
    assert got == {("a", 1): 3, ("a", 2): 0, ("a", 3): 0, ("a", 4): 1, ("b", 2): 9}


def test_unfilled_measures_stay_null(spark):
    df = spark.createDataFrame(
        [(1, 10, 2.5), (3, 5, 1.0)], "bucket long, cnt long, avg double"
    )
    out = {
        r["bucket"]: (r["cnt"], r["avg"])
        for r in fill_time_gaps(df, "bucket", F.lit(1), fill={"cnt": 0}).collect()
    }
    assert out[2] == (0, None)  # cnt filled, avg NULL


def test_empty_input_yields_empty_output(spark):
    df = spark.createDataFrame([], "bucket long, cnt long")
    assert fill_time_gaps(df, "bucket", F.lit(1)).count() == 0


def test_matches_duckdb_generate_series(spark):
    """Oracle equivalence (the formulation the catalog would use)."""
    import duckdb

    rows = [(2, 4), (5, 1), (9, 2)]
    df = spark.createDataFrame(rows, "bucket long, cnt long")
    got = sorted(
        (r["bucket"], r["cnt"])
        for r in fill_time_gaps(df, "bucket", F.lit(1), fill={"cnt": 0}).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(bucket BIGINT, cnt BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        """
        SELECT s.bucket, COALESCE(t.cnt, 0)
        FROM (SELECT unnest(generate_series(
                 (SELECT min(bucket) FROM t), (SELECT max(bucket) FROM t), 1))
               AS bucket) s
        LEFT JOIN t USING (bucket) ORDER BY s.bucket
        """
    ).fetchall()
    assert got == [(b, c) for b, c in want]


def test_null_group_keeps_its_real_values(spark):
    """A NULL group key is a legitimate group (groupBy produces its
    bounds row) but plain join equality can never re-match it — before
    the null-safe join its REAL counts silently came back as the fill
    value. The null group must densify exactly like any other."""
    rows = [
        ("a", 1, 10),
        ("a", 3, 30),
        (None, 1, 5),
        (None, 4, 7),
    ]
    df = spark.createDataFrame(rows, "g string, bucket long, cnt long")
    out = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in fill_time_gaps(
            df, "bucket", F.lit(1), group_cols=["g"], fill={"cnt": 0}
        ).collect()
    }
    assert out[("a", 1)] == 10 and out[("a", 2)] == 0 and out[("a", 3)] == 30
    # the null group's real rows survive; its gaps fill
    assert out[(None, 1)] == 5
    assert out[(None, 2)] == 0 and out[(None, 3)] == 0
    assert out[(None, 4)] == 7
    assert len(out) == 7

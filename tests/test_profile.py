"""One-pass table profiler (operators/profile.py, SURVEY.md §2.11 C46)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dbbspark.operators.profile import profile_drift, profile_table


def _df(spark):
    rows = [
        (1, "alpha", 1.5, datetime.datetime(2024, 1, 1), ["a", "b"]),
        (2, "beta", 2.5, datetime.datetime(2024, 6, 1), ["c"]),
        (3, None, None, None, None),
        (4, "alpha", 4.0, datetime.datetime(2024, 3, 1), []),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, score double, ts timestamp, tags array<string>"
    )


def test_profile_values(spark):
    p = profile_table(_df(spark))
    assert p["n_rows"] == 4
    c = p["columns"]
    assert c["id"]["n_nulls"] == 0 and c["id"]["min"] == 1 and c["id"]["max"] == 4
    assert abs(c["id"]["mean"] - 2.5) < 1e-9
    assert c["name"]["n_nulls"] == 1 and c["name"]["null_rate"] == 0.25
    assert c["name"]["approx_distinct"] == 2  # alpha, beta (exact at this size)
    assert c["name"]["minlen"] == 4 and c["name"]["maxlen"] == 5
    assert c["score"]["min"] == 1.5 and c["score"]["max"] == 4.0
    assert c["ts"]["min"].startswith("2024-01-01")
    assert c["tags"]["maxsize"] == 2


def test_profile_job_count_independent_of_columns(spark):
    """One aggregation pass regardless of column count: profiling 5
    columns must launch exactly as many Spark jobs as profiling 1
    (AQE may split the agg into a fixed number of stage-jobs, but
    per-column extra jobs would scale with the schema)."""
    df = _df(spark).localCheckpoint(eager=True)
    sc = spark.sparkContext
    jt = sc._jsc.sc().statusTracker()

    # count via dedicated job groups, not a global diff — async jobs from
    # other tests' cleanup (streaming listeners, lazy checkpoints) land in
    # a global count and made this pin flaky under full-suite ordering
    sc.setJobGroup("prof_one_col", "pin")
    profile_table(df, columns=["id"])
    one_col = len(jt.getJobIdsForGroup("prof_one_col"))

    sc.setJobGroup("prof_all_cols", "pin")
    profile_table(df)
    all_cols = len(jt.getJobIdsForGroup("prof_all_cols"))
    sc.setLocalProperty("spark.jobGroup.id", None)

    assert all_cols == one_col, (one_col, all_cols)


def test_profile_empty_table(spark):
    df = _df(spark).where(F.lit(False))
    p = profile_table(df)
    assert p["n_rows"] == 0
    assert p["columns"]["id"]["null_rate"] == 0.0


def test_profile_column_subset(spark):
    p = profile_table(_df(spark), columns=["id"])
    assert list(p["columns"]) == ["id"]


def test_drift_findings(spark):
    before = profile_table(_df(spark))
    after_df = _df(spark).select(
        "id",
        F.lit(None).cast("string").alias("name"),  # null-rate jump
        F.col("score").cast("double"),
        "ts",
        "tags",
    )
    after = profile_table(after_df)
    kinds = {(f["column"], f["kind"]) for f in profile_drift(before, after)}
    assert ("name", "null_rate_jump") in kinds
    # dropping a column entirely
    after2 = profile_table(_df(spark).drop("tags"))
    kinds2 = {(f["column"], f["kind"]) for f in profile_drift(before, after2)}
    assert ("tags", "vanished") in kinds2


def test_drift_clean_when_identical(spark):
    p = profile_table(_df(spark))
    assert profile_drift(p, p) == []


def test_check_table_verdicts(spark):
    from dbbspark.operators.profile import check_table

    df = _df(spark)
    checks = [
        {"check": "not_null", "column": "id"},
        {"check": "not_null", "column": "name"},          # 1 null -> fail
        {"check": "unique", "column": "id"},
        {"check": "unique", "column": "name"},            # alpha twice -> fail
        {"check": "between", "column": "score", "min": 0, "max": 3},  # 4.0 -> fail
        {"check": "in_set", "column": "name", "values": ["alpha", "beta"]},
        {"check": "matches", "column": "name", "pattern": "^[a-z]+$"},
        {"check": "min_distinct", "column": "name", "value": 2},
        {"check": "row_count_between", "min": 1, "max": 10},
        {"check": "row_count_between", "min": 100},       # fail
    ]
    res = check_table(df, checks)
    verdicts = [(r["check"], r["column"], r["passed"]) for r in res]
    assert verdicts == [
        ("not_null", "id", True),
        ("not_null", "name", False),
        ("unique", "id", True),
        ("unique", "name", False),
        ("between", "score", False),
        ("in_set", "name", True),  # NULL row skipped (paired not_null catches it)
        ("matches", "name", True),
        ("min_distinct", "name", True),
        ("row_count_between", None, True),
        ("row_count_between", None, False),
    ]
    by = {(r["check"], r["column"]): r["observed"] for r in res}
    assert by[("not_null", "name")] == 1
    assert by[("unique", "name")] == 1  # one duplicated value
    assert by[("between", "score")] == 1


def test_check_table_one_job_regardless_of_checks(spark):
    from dbbspark.operators.profile import check_table

    df = _df(spark).localCheckpoint(eager=True)
    jt = spark.sparkContext._jsc.sc().statusTracker()
    one = [{"check": "not_null", "column": "id"}]
    many = one + [
        {"check": "between", "column": "score", "min": 0, "max": 10},
        {"check": "in_set", "column": "name", "values": ["alpha", "beta"]},
        {"check": "matches", "column": "name", "pattern": ".*"},
        {"check": "min_distinct", "column": "name", "value": 1},
        {"check": "row_count_between", "min": 0},
    ]
    sc = spark.sparkContext
    sc.setJobGroup("checks_one", "pin"); check_table(df, one)
    jobs_one = len(jt.getJobIdsForGroup("checks_one"))
    sc.setJobGroup("checks_many", "pin"); check_table(df, many)
    jobs_many = len(jt.getJobIdsForGroup("checks_many"))
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert jobs_many == jobs_one, (jobs_one, jobs_many)


def test_check_table_unknown_kind_raises(spark):
    import pytest as _pytest

    from dbbspark.operators.profile import check_table

    with _pytest.raises(ValueError):
        check_table(_df(spark), [{"check": "nope", "column": "id"}])


def test_profile_sketch_merge_equals_one_shot(spark):
    from dbbspark.operators.profile import (
        merge_profile_sketches,
        profile_sketch,
        render_profile,
    )

    full = _df(spark)
    a = full.where(F.col("id") <= 2)
    b = full.where(F.col("id") > 2)
    merged = merge_profile_sketches(
        profile_sketch(a).unionByName(profile_sketch(b))
    )
    one_shot = render_profile(profile_sketch(full))
    got = render_profile(merged)
    assert got == one_shot
    assert got["n_rows"] == 4
    c = got["columns"]
    assert c["name"]["n_nulls"] == 1 and c["name"]["approx_distinct"] == 2
    assert abs(c["id"]["mean"] - 2.5) < 1e-9
    assert c["score"]["min"] == 1.5 and c["score"]["max"] == 4.0


def test_profile_sketch_matches_profile_table(spark):
    """The incremental path and the one-pass path agree on the shared
    statistics (distinct is HLL in both; exact at this size)."""
    from dbbspark.operators.profile import profile_sketch, render_profile

    direct = profile_table(_df(spark))
    inc = render_profile(profile_sketch(_df(spark)))
    for col, stats in inc["columns"].items():
        for key, v in stats.items():
            if key in direct["columns"][col]:
                dv = direct["columns"][col][key]
                if isinstance(v, float):
                    assert abs(v - dv) < 1e-6, (col, key)
                else:
                    assert v == dv, (col, key)


def test_profile_sketch_empty_batch_is_neutral(spark):
    from dbbspark.operators.profile import (
        merge_profile_sketches,
        profile_sketch,
        render_profile,
    )

    full = _df(spark)
    empty = full.where(F.lit(False))
    merged = merge_profile_sketches(
        profile_sketch(full).unionByName(profile_sketch(empty))
    )
    assert render_profile(merged) == render_profile(profile_sketch(full))

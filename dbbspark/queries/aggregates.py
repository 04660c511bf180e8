"""Aggregation layer (SURVEY.md §2.4 A5-A9; A1-A4 live in reconcile.py).

All aggregations here are single groupBy passes: Spark's HashAggregate
does map-side partial aggregation automatically (A10), so each is one
shuffle of pre-combined partials — the property that keeps them linear at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..tables import load_table


@query(
    "q_rollup",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 100) AS BIGINT) AS value_bucket,
           COUNT(*) AS cnt,
           max(ts) AS latest_ts,
           arg_max(event_id, ts) AS latest_event_id,
           max(value) AS max_value,
           GROUPING(event_type) AS g_type,
           GROUPING(CAST(floor(value / 100) AS BIGINT)) AS g_bucket,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS event_id__nulls,
           min(event_id) AS event_id__min,
           max(event_id) AS event_id__max,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS value__nulls,
           min(value) AS value__min,
           max(value) AS value__max
    FROM events
    GROUP BY ROLLUP(event_type, CAST(floor(value / 100) AS BIGINT))
    """,
    doc="A5+A8+C46 (merged): rollup — replaces the reference's two separate "
    "summary passes (per-nite + per-propid, bin/monitor_DBB_stagein.py:"
    "1012-1038 vs 968-981) with one multi-level aggregation — carrying the "
    "scalar max / latest-row lookups at every level (latest log file, "
    "latest failure, bin/monitor_DBB_stagein.py:170-181,992; max_by is "
    "the relational form of 'sort then take last'; ts is unique in the "
    "fixtures so arg_max is deterministic). The `<col>__<stat>` columns "
    "are the C46 profiler's per-column stat set folded in via "
    "operators/profile.py:profile_aggs (deterministic subset: null "
    "counts + min/max) — per-group data profiling riding the SAME "
    "aggregation pass instead of a second scan, now under the DuckDB "
    "oracle too.",
    tags=("agg", "profile", "closure"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_aggs

    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 100).cast("bigint")
    d = ev.select("event_type", bucket.alias("value_bucket"), "ts", "event_id", "value")
    return d.rollup("event_type", "value_bucket").agg(
        F.count("*").alias("cnt"),
        F.max("ts").alias("latest_ts"),
        F.max_by("event_id", "ts").alias("latest_event_id"),
        F.max("value").alias("max_value"),
        F.grouping("event_type").cast("bigint").alias("g_type"),
        F.grouping("value_bucket").cast("bigint").alias("g_bucket"),
        *profile_aggs(d, ["event_id", "value"]),
    )


@query(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_users_ok,
           TRUE AS approx_median_ok,
           k.kmv_kth, k.kmv_est
    FROM events
    CROSS JOIN (
      SELECT CAST(max(h) AS BIGINT) AS kmv_kth,
             round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                   ELSE 63.0 / ((CAST(max(h) AS DOUBLE) + 1.0)
                                / 1152921504606846976.0) END, 3) AS kmv_est
      FROM (SELECT h FROM (
              SELECT DISTINCT CAST(('0x' || substr(md5(
                       CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM events WHERE user_id IS NOT NULL)
            ORDER BY h LIMIT 64)
    ) k
    GROUP BY event_type, k.kmv_kth, k.kmv_est
    """,
    doc="A9 (closure, 100 TB): HyperLogLog approx_count_distinct + "
    "approx_percentile — the sketches that replace exact distinct/quantile "
    "at scale. Sketch values are engine-specific, so the oracle contract "
    "is a deterministic BOUND: Spark emits whether its sketch lands within "
    "10% of the exact value it also computes; the oracle expects TRUE "
    "(plus the exact counts, which must hash-match). "
    "tests/test_aggregates.py separately asserts ≤5% error. "
    "FOLDED C44 (r11): `kmv_kth`/`kmv_est` run the KMV bottom-k sketch "
    "(operators/sketches.kmv_sketch over the engine-portable md5-int "
    "hash) end to end — the k-th minimum hash and the (k-1)/u_(k) "
    "cardinality estimate, both re-derived verbatim by the oracle's "
    "ORDER BY h LIMIT k over distinct hashes (VERDICT r10 item 5): a "
    "distinct/ordering/saturation bug in the sketch cannot hide. The "
    "estimate divides by u_(k) normalized over md5-int's [0, 2^60) "
    "domain, not xxhash64's int64 range.",
    tags=("agg", "closure", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_int_col
    from ..operators.sketches import kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    # Exact distinct SPLIT OUT as a two-level aggregate and broadcast-
    # joined back: mixing countDistinct (Expand-based) with the imperative
    # percentile buffers in ONE aggregate forces a plan ~8× slower
    # (measured 4.5 s vs 0.6 s at sf0.1) — and at 100 TB the two-level
    # form is the scalable distinct anyway (partial dedup map-side,
    # no Expand doubling of the scan).
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.lit(1))
        .groupBy("event_type")
        .agg(F.count("*").alias("exact_users"))
    )
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.approx_count_distinct("user_id").alias("_approx_users"),
        F.percentile_approx("value", 0.5).alias("_approx_median"),
        F.expr("percentile(value, 0.5)").alias("_exact_median"),
    ).join(F.broadcast(exact), "event_type")
    within = lambda a, b, tol: (  # noqa: E731
        F.abs(F.col(a) - F.col(b)) <= tol * F.abs(F.col(b)) + F.lit(1e-9)
    )
    # C44 fold: the KMV sketch end to end over the portable md5-int hash
    # (k-row relation → one agg row), broadcast onto every group row. The
    # saturation branch and the (k-1)/u_(k) estimator are both inside the
    # checked values; u_(k) normalizes over md5-int's [0, 2^60) domain.
    sk = kmv_sketch(
        ev, F.col("user_id"), k=64,
        hash_col=md5_int_col(F.col("user_id").cast("string")),
    )
    kstat = sk.agg(
        F.max("h").alias("kmv_kth"), F.count("*").alias("_n")
    ).select(
        F.col("kmv_kth"),
        F.round(
            F.when(F.col("_n") < 64, F.col("_n").cast("double")).otherwise(
                F.lit(63.0)
                / ((F.col("kmv_kth").cast("double") + F.lit(1.0))
                   / F.lit(float(1 << 60)))
            ),
            3,
        ).alias("kmv_est"),
    )
    return agg.select(
        "event_type",
        "cnt",
        "exact_users",
        within("_approx_users", "exact_users", 0.1).alias("approx_users_ok"),
        within("_approx_median", "_exact_median", 0.1).alias("approx_median_ok"),
    ).crossJoin(F.broadcast(kstat))


@query(
    "q_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           median(l_quantity) AS median_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="U5 (closure): custom aggregate as a GROUPED_AGG pandas_udf — the "
    "Spark-native form of a UDAF (the reference has none; its plugin "
    "system is row-level only, SURVEY.md §2.10). Arrow ships each group's "
    "column once; the exact median is computed vectorized in pandas. At "
    "scale prefer percentile_approx (sketch, partial-aggregable) — a "
    "GROUPED_AGG UDF cannot partial-aggregate, so every group's values "
    "shuffle to one task.",
    tags=("agg", "udf", "closure"),
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # annotations assigned as real objects: `from __future__ import
    # annotations` stringifies inline hints, which pandas_udf can't infer.
    def _median(v):
        return float(v.median())

    _median.__annotations__ = {"v": pd.Series, "return": float}
    exact_median = pandas_udf(_median, "double")

    def _count(v):
        return len(v)

    _count.__annotations__ = {"v": pd.Series, "return": int}
    grp_count = pandas_udf(_count, "long")

    # GROUPED_AGG UDFs can't mix with built-in aggregates in one agg —
    # the companion count is a pandas aggregate too.
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_median("l_quantity").alias("median_qty"),
        grp_count("l_quantity").alias("cnt"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT nite,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) AS BIGINT) AS cnt_total
    FROM (SELECT strftime(ts - INTERVAL 15 HOURS, '%Y%m%d') AS nite, event_type
          FROM events)
    GROUP BY nite
    """,
    doc="F7 + pivot (merged): the 'nite' day bucket — shift -15h then "
    "yyyyMMdd (bin/monitor_DBB_stagein.py:707-715) — under the monitor's "
    "per-nite × state count matrix (the HTML summary table shape, "
    "bin/monitor_DBB_stagein.py:522-689) as groupBy().pivot() with an "
    "EXPLICIT value list — without it Spark runs an extra distinct pass "
    "over the pivot column, a full shuffle at scale. cnt_total (the old "
    "per-nite count) is the row sum: the five event types are exhaustive "
    "in the fixtures.",
    tags=("agg", "pivot", "closure"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..domain import nite_col

    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.select(nite_col(F.col("ts")).alias("nite"), "event_type")
        .groupBy("nite")
        .pivot("event_type", kinds)
        .count()
    )
    zero = F.lit(0).cast("bigint")
    filled = [F.coalesce(F.col(k), zero).alias(k) for k in kinds]
    total = sum(
        (F.coalesce(F.col(k), zero) for k in kinds), F.lit(0).cast("bigint")
    ).alias("cnt_total")
    return out.select("nite", *filled, total)

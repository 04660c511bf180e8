"""Join layer (SURVEY.md §2.3 J1-J10).

Join-strategy notes for 100 TB:
- J1 (dim lookup): small dimension → broadcast hash join (automatic under
  autoBroadcastJoinThreshold; the reference prefetches dims by hand).
- J2/J5/J7 (enrichment/semi/multikey): equi joins; shuffle hash or
  broadcast depending on side sizes — left to Catalyst + AQE.
- J3/J4 (anti): see queries/reconcile.py.
- J6 (interval): bucketized equi rewrite (operators/intervals.py) — the
  naive theta form is quadratic.
- J10 (big×big): sort-merge join pinned with a merge hint; at scale both
  sides would be bucketed on the join key to eliminate the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..domain import DESDM_SQL, FAILURES_SQL, SISPI_SQL, desdm, failures, sispi
from ..functions import MONEY_SUM_SQL, money_sum
from ..operators.intervals import interval_join
from ..tables import load_table


@query(
    "q_equi_join",
    oracle=f"""
    SELECT n_name, COUNT(*) AS cnt, {MONEY_SUM_SQL("c_acctbal", "sum_bal")}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="J1: equi lookup join against a small dimension — the per-nite "
    "exposure fetch loop (bin/monitor_DBB_stagein.py:790-803) as one "
    "broadcast hash join.",
    tags=("join",),
)
def q_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"), money_sum("c_acctbal", "sum_bal"))
    )


@query(
    "q_left_enrich",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), desdm AS ({DESDM_SQL})
    SELECT s.expnum, s.nite, s.obstype,
           CASE WHEN d.expnum IS NOT NULL THEN 'Y' ELSE 'N' END AS in_archive,
           coalesce(d.exptime, -1.0) AS archive_exptime
    FROM sispi s LEFT JOIN desdm d ON s.expnum = d.expnum
    """,
    doc="J2: left-outer enrichment join with Y/N presence flag and NULL "
    "fill — combine_sne_info (bin/monitor_DBB_stagein.py:51-98).",
    tags=("join",),
)
def q_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sispi(spark, sf_dir).alias("s")
    d = desdm(spark, sf_dir).alias("d")
    return s.join(d, F.col("s.expnum") == F.col("d.expnum"), "left").select(
        F.col("s.expnum").alias("expnum"),
        F.col("s.nite").alias("nite"),
        F.col("s.obstype").alias("obstype"),
        F.when(F.col("d.expnum").isNotNull(), "Y").otherwise("N").alias("in_archive"),
        F.coalesce(F.col("d.exptime"), F.lit(-1.0)).alias("archive_exptime"),
    )


@query(
    "q_semi_join",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), fails AS ({FAILURES_SQL})
    SELECT f.nite, f.expnum, f.orig_filename
    FROM fails f
    WHERE EXISTS (SELECT 1 FROM sispi s
                  WHERE s.nite = f.nite AND s.expnum = f.expnum)
    """,
    doc="J5: left-semi join — failures kept only when their (nite, expnum) "
    "appears in SISPI (fail_by_nite, bin/monitor_DBB_stagein.py:819-828).",
    tags=("join",),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    f_ = failures(spark, sf_dir)
    s = sispi(spark, sf_dir)
    return f_.join(s, ["nite", "expnum"], "left_semi").select(
        "nite", "expnum", "orig_filename"
    )


@query(
    "q_interval_join",
    oracle="""
    WITH iv AS (
      SELECT o_custkey AS propid,
             min(o_orderdate) AS start_time,
             min(o_orderdate) + INTERVAL 30 DAY AS end_time
      FROM orders GROUP BY o_custkey),
    gated AS (
      SELECT propid, start_time, end_time FROM iv
      ORDER BY CAST(('0x' || substr(md5(CAST(propid AS VARCHAR)), 1, 15))
                    AS BIGINT), propid
      LIMIT 256),
    brute AS (
      SELECT g.propid, COUNT(*) AS cnt_in_window
      FROM orders o JOIN gated g
        ON o.o_orderdate >= g.start_time AND o.o_orderdate <= g.end_time
      GROUP BY g.propid),
    pts AS (
      SELECT o_orderdate AS ts, COUNT(*) AS c FROM orders GROUP BY 1),
    cum AS (
      SELECT ts, CAST(SUM(c) OVER (ORDER BY ts) AS BIGINT) AS f FROM pts),
    f_end AS (
      SELECT iv.propid, cum.f
      FROM iv ASOF LEFT JOIN cum ON iv.end_time >= cum.ts),
    f_start AS (
      SELECT iv.propid, cum.f
      FROM iv ASOF LEFT JOIN cum
        ON iv.start_time - INTERVAL 1 DAY >= cum.ts)
    SELECT f_end.propid,
           brute.cnt_in_window,
           COALESCE(f_end.f, 0) - COALESCE(f_start.f, 0) AS cnt_sweep
    FROM f_end
    JOIN f_start ON f_end.propid = f_start.propid
    LEFT JOIN brute ON f_end.propid = brute.propid
    """,
    doc="J6: interval (theta/range) join — propid validity windows vs "
    "per-nite timestamps (bin/monitor_DBB_stagein.py:868-877). Spark side "
    "uses the bucketized equi rewrite (operators/intervals.py); naive form "
    "is a BroadcastNestedLoopJoin that dies at scale. FOLDED C20 (r10): "
    "`cnt_sweep` computes the per-interval count through "
    "interval_count_points' prefix-sum sweep (NO pair materialization) "
    "over the FULL corpus. r11 (the sf1 catalog run found this row "
    "super-linear, exactly as predicted): the fixture's windows overlap "
    "densely, so the generic-join leg's containment-pair space is "
    "QUADRATIC in sf — 28.9M pairs at sf0.1, ~2.9e9 at sf1 — in Spark "
    "AND in the old oracle's single brute theta join. The join leg "
    "(cnt_in_window, exercising J6 itself) therefore runs on a "
    "deterministic FIXED 256-interval panel (md5-ordered TakeOrdered — "
    "a fixed COUNT, not a fixed fraction, so the brute leg's pair "
    "volume is strictly linear in sf), NULL elsewhere, "
    "while cnt_sweep stays full-corpus. The oracle re-derives the "
    "stratum brute (independent containment check: on gated rows "
    "cnt_in_window must equal cnt_sweep) and the full sweep via "
    "DuckDB's OWN cumulative window + ASOF joins — a third mechanism "
    "agreeing on every boundary F() lookup.",
    tags=("join", "interval"),
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_int_col
    from ..operators.intervals import interval_count_points
    from dbbspark.session import cut_lineage

    orders = load_table(spark, sf_dir, "orders")
    iv = orders.groupBy(F.col("o_custkey").alias("propid")).agg(
        F.min("o_orderdate").alias("start_time"),
        (F.min("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("end_time"),
    ).transform(cut_lineage, eager=False)
    # FIXED-COUNT panel, not a fixed fraction: a fractional stratum's
    # pair volume is still quadratic in sf (0.02·intervals × probes);
    # 256 md5-ordered intervals make the brute leg strictly linear in
    # corpus size at every scale factor (TakeOrdered — no global sort)
    gated = iv.orderBy(
        md5_int_col(F.col("propid").cast("string")), "propid"
    ).limit(256)
    probe = orders.select("o_orderkey", "o_orderdate")
    joined = interval_join(
        probe, gated, "o_orderdate", "start_time", "end_time", bucket_days=7
    )
    sweep = interval_count_points(
        iv, probe, "o_orderdate", "start_time", "end_time"
    ).select("propid", F.col("cnt_in_window").alias("cnt_sweep"))
    return sweep.join(
        joined.groupBy("propid").agg(F.count("*").alias("cnt_in_window")),
        "propid",
        "left",
    ).select("propid", "cnt_in_window", "cnt_sweep")


@query(
    "q_multikey_join",
    oracle="""
    WITH manifest AS (
      SELECT DISTINCT l_returnflag, l_linestatus,
             CAST(month(l_shipdate) AS INT) AS ship_month
      FROM lineitem WHERE l_quantity > 45)
    SELECT g.l_returnflag, g.l_linestatus, g.ship_month, g.cnt,
           CASE WHEN m.l_returnflag IS NOT NULL THEN 'Y' ELSE 'N' END AS has_manifest
    FROM (SELECT l_returnflag, l_linestatus,
                 CAST(month(l_shipdate) AS INT) AS ship_month, COUNT(*) AS cnt
          FROM lineitem GROUP BY 1, 2, 3) g
    LEFT JOIN manifest m
      ON g.l_returnflag = m.l_returnflag
     AND g.l_linestatus = m.l_linestatus
     AND g.ship_month = m.ship_month
    """,
    doc="J7: multi-key existence join — manifest presence on the composite "
    "(nite, field, band) key (bin/monitor_DBB_stagein.py:77-84,913-917).",
    tags=("join",),
)
def q_multikey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus", "ship_month"]
    with_month = li.withColumn("ship_month", F.month("l_shipdate"))
    manifest = with_month.where(F.col("l_quantity") > 45).select(*keys).distinct()
    grouped = with_month.groupBy(*keys).agg(F.count("*").alias("cnt"))
    m = manifest.withColumnRenamed("l_returnflag", "m_rf")
    joined = grouped.join(
        m,
        (grouped.l_returnflag == m.m_rf)
        & (grouped.l_linestatus == m.l_linestatus)
        & (grouped.ship_month == m.ship_month),
        "left",
    )
    return joined.select(
        grouped.l_returnflag,
        grouped.l_linestatus,
        grouped.ship_month,
        "cnt",
        F.when(F.col("m_rf").isNotNull(), "Y").otherwise("N").alias("has_manifest"),
    )


@query(
    "q_big_join",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
    doc="J10: big×big sort-merge join — lineitem ⋈ orders without a "
    "broadcastable side (not present in the reference, required at 100 TB; "
    "merge hint pins SMJ, bucketing removes the shuffle at scale).",
    tags=("join", "scale"),
)
def q_big_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= "1997-01-01"
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    # Exact money math: each factor has ≤2 true decimals, so the
    # double→decimal casts are unambiguous and the decimal product/sum is
    # exact in both engines (a raw double product would diverge in the
    # midpoint-rounding of the final cast).
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(5,2)")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


@query(
    "q_skew_salted_join",
    oracle="""
    WITH dim AS (
      SELECT l_returnflag, CAST(AVG(l_extendedprice) AS DOUBLE) AS avg_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag, l.l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           round(CAST(MAX(d.avg_price) AS DOUBLE), 4) AS avg_price
    FROM lineitem l JOIN dim d USING (l_returnflag)
    GROUP BY l.l_returnflag, l.l_linestatus
    """,
    doc="Skew-handling closure (SURVEY.md §7 scale pass): lineitem joined "
    "to a 3-row dimension on l_returnflag — a maximally hot key — through "
    "the salted-join operator (operators/skew.py). The salt scatters each "
    "hot key over 8 sub-partitions and is dropped before aggregation, so "
    "the result hash-matches the plain join.",
    tags=("join", "skew", "closure"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_equi_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("avg_price")
    )
    joined = salted_equi_join(
        li.select("l_returnflag", "l_linestatus"), dim, on=["l_returnflag"]
    )
    return joined.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        # round 4: the dimension's AVG accumulates millions of doubles
        # at sf1+, and summation ORDER differs across engines (and
        # across Spark partition counts) at the ~1e-10 relative level —
        # the sf1 catalog run caught exactly that as a spurious hash
        # mismatch; the check's subject is the salted join, not
        # float-accumulation ordering
        F.round(F.max("avg_price"), 4).alias("avg_price"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate,
             max(o_totalprice) AS price
      FROM orders GROUP BY o_custkey, o_orderdate),
    e AS (
      SELECT event_id, user_id, ts,
             last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_signup_value
      FROM events)
    SELECT e.event_id, e.user_id, e.ts, e.last_signup_value,
           o.price AS asof_price
    FROM e
    ASOF LEFT JOIN r o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="J9 (merged, both forms): two-table as-of join — each event "
    "matched to the most recent order (by date, per customer) at or "
    "before its timestamp, via the union-timeline operator "
    "(operators/asof.py: one key shuffle + one window pass, no range "
    "join) — plus the single-table last-known-value form (most recent "
    "prior 'signup' value per user via last(ignorenulls) window). Right "
    "side pre-aggregated to one row per (key, ts) so both engines break "
    "ties identically; oracle is DuckDB's native ASOF JOIN.",
    tags=("join", "asof", "closure"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(F.col("event_type") == "signup", F.col("value"))
    enriched = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(marker, ignorenulls=True).over(w).alias("last_signup_value"),
    )
    orders = load_table(spark, sf_dir, "orders")
    r = orders.groupBy(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    ).agg(F.max("o_totalprice").alias("price"))
    return asof_join(
        enriched, r, on="user_id", left_ts="ts", right_ts="o_orderdate",
        value_col="price", out_col="asof_price",
    )

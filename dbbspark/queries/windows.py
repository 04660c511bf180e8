"""Window layer (SURVEY.md §2.5 W1-W4, §2.6 O-T1 — top-k now lives in
q_union, queries/sets.py).

The reference's sequence-dedup and "last line of the log" are sorted-dict
iterations; here each is a window spec. Every ORDER BY carries a unique
tiebreaker so results are deterministic (SURVEY.md §7 'last-wins dedup'
hard part: dropDuplicates picks an arbitrary winner; row_number over an
explicit order does not).

Scale note (round-2): no window here partitions by a low-cardinality key.
Ranks over the 3-value l_returnflag are computed on the tiny
(flag, qty) aggregate and broadcast back (q_rank_frame) — the global-sort
form would funnel the whole table through ≤3 tasks regardless of cluster
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..catalog import query
from ..tables import load_table


@query(
    "q_window_dedup",
    oracle="""
    SELECT event_id, user_id, event_type,
           (row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY event_id DESC) > 1) AS skip,
           (row_number() OVER (PARTITION BY event_type
                               ORDER BY ts DESC, event_id DESC) = 1)
             AS is_last_of_type
    FROM events
    """,
    doc="W1+W2 (merged): keep-last-per-key dedup — within a (seqid, "
    "seqnum) group keep the greatest expnum, mark earlier ones skip "
    "(mark_sne_skip, bin/monitor_DBB_stagein.py:922-942) — plus top-1 per "
    "stream as a boolean (last accept/processed/error line of each log, "
    "bin/monitor_DBB_stagein.py:188-263). Deterministic windows, not "
    "dropDuplicates.",
    tags=("window",),
)
def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("user_id", "event_type").orderBy(F.desc("event_id"))
    w_last = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.row_number().over(w_dedup) > 1).alias("skip"),
        (F.row_number().over(w_last) == 1).alias("is_last_of_type"),
    )


@query(
    "q_rank_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
           rank() OVER (PARTITION BY l_returnflag
                        ORDER BY CAST(floor(l_quantity) AS INT) DESC) AS qty_rank,
           dense_rank() OVER (PARTITION BY l_returnflag
                              ORDER BY CAST(floor(l_quantity) AS INT) DESC) AS qty_dense_rank,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                  OVER (PARTITION BY l_suppkey
                        ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS moving_qty
    FROM lineitem
    """,
    doc="W3 (closure): rank / dense_rank with genuine ties + a rows-frame "
    "moving sum — the frame machinery the reference lacks (SURVEY.md "
    "§2.5). Scale design: the rank partition key (l_returnflag) has 3 "
    "values, so ranks are NOT computed with a global per-flag sort — the "
    "(flag, qty) histogram is aggregated (map-side combine), ranked as a "
    "tiny table, and broadcast-joined back: rank = 1 + count of strictly "
    "greater quantities, dense_rank = distinct-quantity row_number. The "
    "moving sum partitions by l_suppkey (high cardinality → parallel); "
    "the order carries (l_quantity, l_returnflag) tiebreakers so rows "
    "still tied are identical in every output column and the frame sum "
    "is permutation-invariant.",
    tags=("window", "closure"),
)
def q_rank_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_returnflag",
        "l_quantity",
        F.floor("l_quantity").cast("int").alias("qty"),
    )
    # Tiny aggregate: |flags| × |distinct qty| rows (≤ 3 × 50 on TPC-H).
    counts = base.groupBy("l_returnflag", "qty").agg(F.count("*").alias("n"))
    w_hist = Window.partitionBy("l_returnflag").orderBy(F.desc("qty"))
    ranks = counts.select(
        "l_returnflag",
        "qty",
        (
            F.coalesce(
                F.sum("n").over(
                    w_hist.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("bigint"),
            )
            + 1
        ).alias("qty_rank"),
        F.row_number().over(w_hist).alias("qty_dense_rank"),
    )
    w_frame = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        base.withColumn(
            "moving_qty", F.sum(F.col("l_quantity").cast("bigint")).over(w_frame)
        )
        .join(F.broadcast(ranks), ["l_returnflag", "qty"])
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_returnflag",
            "qty_rank",
            "qty_dense_rank",
            "moving_qty",
        )
    )


@query(
    "q_window_seq",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id) OVER w AS prev_event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w2 AS DOUBLE)
             AS running_value,
           COUNT(*) OVER w2 AS running_cnt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="W3+W4 (merged): lag for sequence-gap detection — the natural "
    "extension of the reference's seqnum bookkeeping "
    "(bin/monitor_DBB_stagein.py:493) — plus running/cumulative "
    "aggregation over the same per-user timeline. Decimal accumulation: "
    "DuckDB evaluates window sums with a segment tree (different fp "
    "association than Spark's incremental fold), so double running sums "
    "diverge in the last bit — decimal is associative and exact.",
    tags=("window", "closure"),
)
def q_window_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    micros = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (micros - F.lag(micros).over(w)).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w2).cast("double").alias("running_value"),
        F.count("*").over(w2).alias("running_cnt"),
    )

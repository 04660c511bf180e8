"""Window layer (SURVEY.md §2.5 W1-W4, §2.6 O-T1).

The reference's sequence-dedup and "last line of the log" are sorted-dict
iterations; here each is a window spec. Every ORDER BY carries a unique
tiebreaker so results are deterministic (SURVEY.md §7 'last-wins dedup'
hard part: dropDuplicates picks an arbitrary winner; row_number over an
explicit order does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..catalog import query
from ..domain import FAILURES_SQL, failures
from ..tables import load_table


@query(
    "q_window_dedup",
    oracle="""
    SELECT event_id, user_id, event_type,
           (row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY event_id DESC) > 1) AS skip
    FROM events
    """,
    doc="W1: keep-last-per-key dedup — within a (seqid, seqnum) group keep "
    "the greatest expnum, mark earlier ones skip (mark_sne_skip, "
    "bin/monitor_DBB_stagein.py:922-942). Deterministic window, not "
    "dropDuplicates.",
    tags=("window",),
)
def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.row_number().over(w) > 1).alias("skip"),
    )


@query(
    "q_last_event",
    oracle="""
    SELECT event_type, event_id, ts
    FROM (SELECT event_type, event_id, ts,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    doc="W2: top-1 per stream — last accept/processed/error line of each "
    "log (bin/monitor_DBB_stagein.py:188-263).",
    tags=("window",),
)
def q_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("event_type", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q_rank_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           rank() OVER (PARTITION BY l_returnflag
                        ORDER BY CAST(floor(l_quantity) AS INT) DESC) AS qty_rank,
           dense_rank() OVER (PARTITION BY l_returnflag
                              ORDER BY CAST(floor(l_quantity) AS INT) DESC) AS qty_dense_rank,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                  OVER (PARTITION BY l_returnflag
                        ORDER BY l_orderkey, l_linenumber, l_quantity
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS moving_qty
    FROM lineitem
    """,
    doc="W3 (closure): rank / dense_rank with genuine ties + a rows-frame "
    "moving sum — the frame machinery the reference lacks (SURVEY.md §2.5). "
    "(l_orderkey, l_linenumber) is NOT unique in the fixture, so the frame "
    "order includes l_quantity: remaining ties then have equal quantities "
    "and the moving sum is permutation-invariant.",
    tags=("window", "closure"),
)
def q_rank_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.floor("l_quantity").cast("int")
    w_rank = Window.partitionBy("l_returnflag").orderBy(qty.desc())
    w_frame = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.rank().over(w_rank).alias("qty_rank"),
        F.dense_rank().over(w_rank).alias("qty_dense_rank"),
        F.sum(F.col("l_quantity").cast("bigint")).over(w_frame).alias("moving_qty"),
    )


@query(
    "q_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id) OVER w AS prev_event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="W3 (closure): lag for sequence-gap detection — the natural "
    "extension of the reference's seqnum bookkeeping "
    "(bin/monitor_DBB_stagein.py:493).",
    tags=("window", "closure"),
)
def q_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (micros - F.lag(micros).over(w)).alias("gap_us"),
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_cnt
    FROM events
    """,
    doc="W4 (closure): running/cumulative aggregation over an event "
    "timeline (SURVEY.md §2.5 W4). Decimal accumulation: DuckDB evaluates "
    "window sums with a segment tree (different fp association than "
    "Spark's incremental fold), so double running sums diverge in the last "
    "bit — decimal is associative and exact.",
    tags=("window", "closure"),
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
        F.count("*").over(w).alias("running_cnt"),
    )


@query(
    "q_topk",
    oracle=f"""
    WITH fails AS ({FAILURES_SQL})
    SELECT expnum, orig_filename, rejected_date
    FROM fails
    ORDER BY rejected_date DESC, expnum DESC
    LIMIT 20
    """,
    doc="O-T1: top-k — last 20 failures by rejected_date desc "
    "(bin/monitor_DBB_stagein.py:660-672). Spark executes as "
    "TakeOrderedAndProject (no full sort).",
    tags=("topk",),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    f_ = failures(spark, sf_dir)
    return (
        f_.select("expnum", "orig_filename", "rejected_date")
        .orderBy(F.desc("rejected_date"), F.desc("expnum"))
        .limit(20)
    )

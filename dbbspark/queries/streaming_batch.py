"""Time-window semantics in batch form (SURVEY.md §2.9 ST6/ST7).

These are the window operators the streaming front-end
(dbbspark/streaming) uses, declared here in batch form so the DuckDB
oracle can pin their semantics:
- tumbling 1-day window offset 15h == the reference's "nite"
  (bin/monitor_DBB_stagein.py:707-715),
- sliding 1h/30min windows (every event lands in width/slide = 2),
- session windows (30-min gap) as gaps-and-islands — the SQL-equivalent
  of Spark's session_window, verified against it in
  tests/test_streaming_batch.py.

Round-2 consolidation: tumbling + sliding share one tagged query
(q_time_windows); session windows keep their own (different operator
machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..catalog import query
from ..tables import load_table


@query(
    "q_time_windows",
    oracle="""
    SELECT 'tumbling' AS kind,
           date_trunc('day', ts - INTERVAL 15 HOURS) + INTERVAL 15 HOURS
             AS window_start,
           date_trunc('day', ts - INTERVAL 15 HOURS) + INTERVAL 39 HOURS
             AS window_end,
           '(all)' AS event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT e.event_type, e.value,
             CAST(to_timestamp(
               CAST(floor(epoch(e.ts) / 1800) AS BIGINT) * 1800 - k.k * 1800
             ) AS TIMESTAMP) AS window_start
      FROM events e
      CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
    GROUP BY 1, 2, 3, 4
    """,
    doc="ST6+ST7 (merged): tumbling 1-day window with 15h offset — "
    "window() form of the nite bucket "
    "(bin/monitor_DBB_stagein.py:707-715); in streaming this is the "
    "watermarked aggregation — unioned with the sliding window (1 hour "
    "wide, 30 min slide; every event lands in exactly width/slide = 2 "
    "windows; Spark's window() emits the overlapping assignments "
    "natively, the oracle enumerates slide offsets). Streaming form is "
    "the same expression under a watermark (dbbspark/streaming/"
    "stateful.py).",
    tags=("streaming", "window"),
)
def q_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    money = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    tumb = (
        ev.groupBy(F.window("ts", "1 day", "1 day", "15 hours").alias("w"))
        .agg(F.count("*").alias("cnt"), money.alias("sum_value"))
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.lit("(all)").alias("event_type"),
            "cnt",
            "sum_value",
        )
    )
    slid = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), money.alias("sum_value"))
        .select(
            F.lit("sliding").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    return tumb.unionByName(slid)


@query(
    "q_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS island
      FROM marked)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTES AS session_end,
           COUNT(*) AS cnt
    FROM islands
    GROUP BY user_id, island
    """,
    doc="ST7 (closure): session windows (30-min gap) per user — the "
    "gaps-and-islands batch equivalent of session_window(ts, '30 min'); "
    "tests/test_streaming_batch.py asserts equivalence with Spark's "
    "native session_window operator.",
    tags=("streaming", "window", "closure"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    new_session = F.when(
        (micros - F.lag(micros).over(order) >= 30 * 60 * 1_000_000)
        | F.lag("ts").over(order).isNull(),
        1,
    ).otherwise(0)
    marked = ev.select("user_id", "ts", "event_id", new_session.alias("new_session"))
    island = F.sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    islands = marked.select("user_id", "ts", island.alias("island"))
    return islands.groupBy("user_id", "island").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        F.count("*").alias("cnt"),
    ).drop("island")

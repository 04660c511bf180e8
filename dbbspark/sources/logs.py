"""Log-file source + last-event mining (SURVEY.md §2.1 S6, §2.5 W2).

The reference tails DTS/accept/handler logs with seek tricks and `grep`
subprocesses, then regex-parses `MMDD HH:MM:SS`-style stamps with year
inference and UTC→local conversion (`bin/monitor_DBB_stagein.py:139-163`,
`112-137`, `195-297`). Here a log is `spark.read.text` plus
`regexp_extract` columns; "last matching line" is TakeOrderedAndProject
(orderBy desc + limit 1), which needs no global sort — each partition
contributes its own top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Reference log stamp: `MMDD HH:MM:SS` at line start
# (bin/monitor_DBB_stagein.py:119-127).
_STAMP = r"^(\d\d)(\d\d) (\d\d:\d\d:\d\d)"


def read_log(spark: SparkSession, path: str, tz: str = "America/Chicago") -> DataFrame:
    """Read a log file into (line, ts) rows.

    Year inference mirrors the reference: a stamp whose month is greater
    than the current month belongs to the previous year
    (`bin/monitor_DBB_stagein.py:128-133`). Stamps are UTC; `ts_local` is
    the converted wall-clock in ``tz``.
    """
    df = spark.read.text(path).withColumnRenamed("value", "line")
    mm = F.regexp_extract("line", _STAMP, 1)
    dd = F.regexp_extract("line", _STAMP, 2)
    hms = F.regexp_extract("line", _STAMP, 3)
    year = F.when(
        mm.cast("int") > F.month(F.current_date()),
        F.year(F.current_date()) - 1,
    ).otherwise(F.year(F.current_date()))
    ts_utc = F.to_timestamp(
        F.when(
            mm != "",
            F.concat_ws(
                " ", F.concat_ws("-", year.cast("string"), mm, dd), hms
            ),
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
    return df.select(
        "line",
        ts_utc.alias("ts_utc"),
        F.from_utc_timestamp(ts_utc, tz).alias("ts_local"),
    )


def last_matching_line(log: DataFrame, pattern: str) -> DataFrame:
    """Last log line containing ``pattern`` (the reference's `grep X |
    tail -1`, `bin/monitor_DBB_stagein.py:210-214,239-244`). Physical plan
    is TakeOrderedAndProject — no full sort, no shuffle of non-winners."""
    return (
        log.where(F.col("line").contains(pattern))
        .orderBy(F.col("ts_utc").desc_nulls_last())
        .limit(1)
    )

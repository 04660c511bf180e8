"""The reference's reconciliation data model, mapped onto the fixtures.

The reference monitor (`bin/monitor_DBB_stagein.py`) reconciles two
databases: the SISPI observatory DB (what was observed/delivered) and the
DESDM archive DB (what actually arrived), plus a failure/quarantine table
(`dts_bad_file`). Per FIXTURES.md §3 those entities are modeled as
deterministic derived views of the `events` fixture:

- **sispi**    — events with `event_id % 5 != 0` (the observatory's view),
  with the reference's derived columns: `nite` (15:00-offset day bucket,
  `bin/monitor_DBB_stagein.py:707-715`), `delivered` flag, `obstype`.
- **desdm**    — events with `event_id % 7 != 0` (the archive's view). The
  two different modular filters create both "missing" rows (in sispi, not
  desdm) and "extra" rows (in desdm, not sispi), the monitor's two
  anti-join reports (`bin/monitor_DBB_stagein.py:1023,1028`).
- **failures** — events with `event_type = 'error'` standing in for
  `dts_bad_file` rows (`bin/monitor_DBB_stagein.py:831-855`), with a
  synthesized `orig_filename` for the regexp round-trip
  (`DECam_(\\d+).fits.fz`, `bin/monitor_DBB_stagein.py:844`).

Each view exists twice, definitionally identical: a DataFrame builder
(Spark side) and a SQL CTE (DuckDB-oracle side). Keep them in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tables import load_table

# --- nite bucketing (reference: shift -15h, format yyyyMMdd) ---------------

NITE_SHIFT = "INTERVAL 15 HOURS"


def nite_col(ts: F.Column) -> F.Column:
    """The reference's "nite" day bucket: an exposure before 15:00 belongs
    to the previous nite (`bin/monitor_DBB_stagein.py:707-715`)."""
    return F.date_format(ts - F.expr(NITE_SHIFT), "yyyyMMdd")


NITE_SQL = "strftime(ts - INTERVAL 15 HOURS, '%Y%m%d')"

# --- derived views ---------------------------------------------------------


def sispi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observatory-side exposure relation, derived from events (the
    fixture's stand-in for the SISPI DB, bin/monitor_DBB_stagein.py:738)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % 5 != 0).select(
        F.col("event_id").alias("expnum"),
        F.col("ts"),
        nite_col(F.col("ts")).alias("nite"),
        F.col("user_id").alias("propid"),
        F.col("event_type").alias("obstype"),
        F.col("value").alias("exptime"),
        (F.col("event_id") % 11 != 0).alias("delivered"),
    )


SISPI_SQL = f"""
    SELECT event_id AS expnum,
           ts,
           {NITE_SQL} AS nite,
           user_id AS propid,
           event_type AS obstype,
           value AS exptime,
           (event_id % 11 != 0) AS delivered
    FROM events WHERE event_id % 5 != 0
"""


def desdm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archive-side exposure relation (DESDM DB stand-in,
    bin/monitor_DBB_stagein.py:790) — deliberately a different slice
    than `sispi` so the anti-joins are non-trivial."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % 7 != 0).select(
        F.col("event_id").alias("expnum"),
        nite_col(F.col("ts")).alias("nite"),
        F.col("user_id").alias("propid"),
        F.col("event_type").alias("obstype"),
        F.col("value").alias("exptime"),
    )


DESDM_SQL = f"""
    SELECT event_id AS expnum,
           {NITE_SQL} AS nite,
           user_id AS propid,
           event_type AS obstype,
           value AS exptime
    FROM events WHERE event_id % 7 != 0
"""


def failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-bad exposures (dts_bad_file stand-in) excluded from the
    missing diff."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("expnum"),
        nite_col(F.col("ts")).alias("nite"),
        F.format_string("DECam_%08d.fits.fz", F.col("event_id")).alias("orig_filename"),
        F.col("ts").alias("rejected_date"),
        F.when(F.col("event_id") % 3 == 0, F.lit("Duplicate file"))
        .otherwise(F.lit("md5sum mismatch"))
        .alias("rejected_msg"),
    )


FAILURES_SQL = f"""
    SELECT event_id AS expnum,
           {NITE_SQL} AS nite,
           printf('DECam_%08d.fits.fz', event_id) AS orig_filename,
           ts AS rejected_date,
           CASE WHEN event_id % 3 = 0 THEN 'Duplicate file'
                ELSE 'md5sum mismatch' END AS rejected_msg
    FROM events WHERE event_type = 'error'
"""

"""Set-operation layer (SURVEY.md §2.7 SET1-SET3).

The reference unions/differences Python sets of dict keys; here they are
relational UNION/EXCEPT/INTERSECT (all DISTINCT semantics, matching set
behavior)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import query
from ..domain import DESDM_SQL, FAILURES_SQL, SISPI_SQL, desdm, failures, sispi


@query(
    "q_union",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), desdm AS ({DESDM_SQL}), fails AS ({FAILURES_SQL})
    SELECT expnum FROM sispi
    UNION SELECT expnum FROM desdm
    UNION SELECT expnum FROM fails
    """,
    doc="SET1: union of key sets — the monitor's combined exposure list "
    "(bin/monitor_DBB_stagein.py:338).",
    tags=("set",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sispi(spark, sf_dir).select("expnum")
    d = desdm(spark, sf_dir).select("expnum")
    f_ = failures(spark, sf_dir).select("expnum")
    return s.union(d).union(f_).distinct()


@query(
    "q_except",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), desdm AS ({DESDM_SQL})
    SELECT expnum FROM sispi WHERE delivered
    EXCEPT SELECT expnum FROM desdm
    """,
    doc="SET2: set difference — the missing/extra set-minus in relational "
    "form (bin/monitor_DBB_stagein.py:1023,1028).",
    tags=("set",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sispi(spark, sf_dir).where("delivered").select("expnum")
    d = desdm(spark, sf_dir).select("expnum")
    return s.exceptAll(d).distinct()


@query(
    "q_intersect",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), desdm AS ({DESDM_SQL})
    SELECT expnum FROM sispi
    INTERSECT SELECT expnum FROM desdm
    """,
    doc="SET3: intersection — metadata-keys ∩ table-columns, row form "
    "(bin/save_DBB_stagein_to_DBB.py:276-278).",
    tags=("set",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sispi(spark, sf_dir).select("expnum")
    d = desdm(spark, sf_dir).select("expnum")
    return s.intersect(d)

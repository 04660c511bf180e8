"""Set-operation layer (SURVEY.md §2.7 SET1-SET3 + §2.6 O-T1).

The reference unions/differences Python sets of dict keys; here they are
relational UNION/EXCEPT/INTERSECT (all DISTINCT semantics, matching set
behavior). Round-2 consolidation: top-k (O-T1) rides on the union query
(TakeOrderedAndProject over the distinct union), EXCEPT and INTERSECT
share one tagged query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..domain import DESDM_SQL, FAILURES_SQL, SISPI_SQL, desdm, failures, sispi


@query(
    "q_union",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), desdm AS ({DESDM_SQL}), fails AS ({FAILURES_SQL}),
    u AS (
      SELECT expnum FROM sispi
      UNION SELECT expnum FROM desdm
      UNION SELECT expnum FROM fails)
    SELECT expnum, (SELECT COUNT(*) FROM u) AS n_union
    FROM u ORDER BY expnum DESC LIMIT 20
    """,
    doc="SET1+O-T1+A7 (merged): union of key sets — the monitor's combined "
    "exposure list (bin/monitor_DBB_stagein.py:338) — then top-k over it "
    "(last-20-by-key shape, bin/monitor_DBB_stagein.py:660-672; Spark "
    "executes the orderBy+limit as TakeOrderedAndProject, no full sort). "
    "The union dedups via .distinct() — A7's operator — and n_union pins "
    "the full distinct cardinality so the limit doesn't mask union bugs.",
    tags=("set", "topk"),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sispi(spark, sf_dir).select("expnum")
    d = desdm(spark, sf_dir).select("expnum")
    f_ = failures(spark, sf_dir).select("expnum")
    u = s.union(d).union(f_).distinct()
    total = u.agg(F.count("*").alias("n_union"))
    return (
        u.crossJoin(F.broadcast(total))
        .orderBy(F.desc("expnum"))
        .limit(20)
    )


@query(
    "q_set_diff",
    oracle=f"""
    WITH sispi AS ({SISPI_SQL}), desdm AS ({DESDM_SQL})
    SELECT 'except' AS op, expnum FROM (
      SELECT expnum FROM sispi WHERE delivered
      EXCEPT SELECT expnum FROM desdm)
    UNION ALL
    SELECT 'intersect' AS op, expnum FROM (
      SELECT expnum FROM sispi
      INTERSECT SELECT expnum FROM desdm)
    """,
    doc="SET2+SET3 (merged): set difference — the missing/extra set-minus "
    "in relational form (bin/monitor_DBB_stagein.py:1023,1028) — and "
    "intersection — metadata-keys ∩ table-columns, row form "
    "(bin/save_DBB_stagein_to_DBB.py:276-278) — tagged and unioned.",
    tags=("set",),
)
def q_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    s_all = sispi(spark, sf_dir).select("expnum")
    s_del = sispi(spark, sf_dir).where("delivered").select("expnum")
    d = desdm(spark, sf_dir).select("expnum")
    exc = s_del.exceptAll(d).distinct().select(F.lit("except").alias("op"), "expnum")
    ins = s_all.intersect(d).select(F.lit("intersect").alias("op"), "expnum")
    return exc.unionByName(ins)

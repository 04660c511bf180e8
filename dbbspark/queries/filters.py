"""Projection/filter/predicate layer (SURVEY.md §2.2 P1-P8).

All predicates are Column expressions so Catalyst pushes them into the
parquet scan (PushedFilters) — the declarative form of the reference's
SQL-string WHERE clauses and Python if-gates.

Round-2 consolidation (driver checks ≤50 queries): P1+F16 merged into
q_case_logic, P3+J8 into q_ingest_gate; P5 (rlike) lives in
q_string_funcs (queries/scalars.py). Round 3: P6's case-insensitive
duplicate split moved into the flagship (q_group_count.cnt_dup,
queries/reconcile.py) to free a slot for q_line_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..tables import load_table


@query(
    "q_case_logic",
    oracle="""
    WITH f AS (
      SELECT event_id, event_type,
             CASE WHEN event_type = 'purchase'
                    THEN printf('DECam_%08d.fits', event_id)
                  WHEN event_type = 'signup'
                    THEN printf('manifest_SN-X2_%d.json', event_id)
                  ELSE printf('stage_%d.tmp', event_id) END AS fname
      FROM events)
    SELECT event_id, fname,
           CASE WHEN fname LIKE '%.fits' THEN 'raw'
                WHEN fname LIKE 'manifest_SN%' AND fname LIKE '%.json'
                  THEN 'snmanifest'
                ELSE NULL END AS filetype,
           CASE WHEN event_type = 'error' THEN 'fail'
                WHEN event_id % 5 = 0 AND event_id % 7 != 0 THEN 'extra'
                WHEN event_id % 5 != 0 AND event_id % 11 = 0 THEN 'not delivered'
                WHEN event_id % 5 != 0 AND event_id % 7 = 0 THEN 'missing'
                WHEN event_id % 5 != 0 THEN 'ok'
                ELSE 'unknown' END AS state
    FROM f
    """,
    doc="P1+F16 (merged): extension-dispatch filetype routing — "
    "endswith('.fits')→raw, startswith('manifest_SN')&endswith('.json')→"
    "snmanifest, else NULL (get_filetype, "
    "bin/save_DBB_stagein_to_DBB.py:36-45) — plus the exposure state "
    "machine {fail, extra, not delivered, missing, ok} from presence "
    "flags (bin/monitor_DBB_stagein.py:342-366; flags follow "
    "dbbspark.domain).",
)
def q_case_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fname = (
        F.when(
            F.col("event_type") == "purchase",
            F.format_string("DECam_%08d.fits", F.col("event_id")),
        )
        .when(
            F.col("event_type") == "signup",
            F.format_string("manifest_SN-X2_%d.json", F.col("event_id")),
        )
        .otherwise(F.format_string("stage_%d.tmp", F.col("event_id")))
    )
    df = ev.select("event_id", "event_type", fname.alias("fname"))
    filetype = (
        F.when(F.col("fname").endswith(".fits"), "raw")
        .when(
            F.col("fname").startswith("manifest_SN") & F.col("fname").endswith(".json"),
            "snmanifest",
        )
        .otherwise(F.lit(None).cast("string"))
    )
    in_sispi = F.col("event_id") % 5 != 0
    in_desdm = F.col("event_id") % 7 != 0
    delivered = F.col("event_id") % 11 != 0
    state = (
        F.when(F.col("event_type") == "error", "fail")
        .when(~in_sispi & in_desdm, "extra")
        .when(in_sispi & ~delivered, "not delivered")
        .when(in_sispi & ~in_desdm, "missing")
        .when(in_sispi, "ok")
        .otherwise("unknown")
    )
    return df.select(
        "event_id", "fname", filetype.alias("filetype"), state.alias("state")
    )


@query(
    "q_filter_valid",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type IS NOT NULL
      AND value IS NOT NULL
      AND value >= 0
      AND props IS NOT NULL
    """,
    doc="P2: validity gate — rows failing required-field checks are routed "
    "to quarantine instead of processed (check_valid / handle_bad_file, "
    "bin/save_DBB_stagein_to_DBB.py:143-149,158,199-201).",
)
def q_filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    valid = (
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & F.col("props").isNotNull()
    )
    return ev.where(valid).select("event_id", "event_type", "value")


@query(
    "q_ingest_gate",
    oracle="""
    WITH registry AS (
      SELECT md5(text) AS md5sum FROM documents WHERE doc_id % 3 = 0),
    d AS (
      SELECT doc_id, source,
             'doc_' || CAST(doc_id AS VARCHAR) AS filename,
             CASE WHEN doc_id % 97 = 0 THEN md5('corrupt')
                  ELSE md5(text) END AS declared_md5,
             md5(text) AS actual_md5,
             octet_length(encode(text)) + CASE WHEN doc_id % 89 = 0 THEN 1 ELSE 0 END
               AS stored_size,
             octet_length(encode(text)) AS actual_size
      FROM documents),
    reg2 AS (
      SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS filename,
             CASE WHEN doc_id % 41 = 0 THEN md5('regdrift')
                  ELSE md5(text) END AS reg_md5
      FROM documents WHERE doc_id % 3 = 0),
    kinds AS (
      SELECT filename, 'content_md5_mismatch' AS finding
      FROM d WHERE declared_md5 <> actual_md5
      UNION ALL
      SELECT filename, 'size_mismatch' FROM d
      WHERE stored_size <> actual_size
      UNION ALL
      SELECT d.filename, 'registry_md5_mismatch'
      FROM d JOIN reg2 ON d.filename = reg2.filename
      WHERE d.declared_md5 <> reg2.reg_md5
      UNION ALL
      SELECT filename, 'missing_in_registry' FROM d
      WHERE filename NOT IN (SELECT filename FROM reg2)),
    scrub AS (
      SELECT filename,
             array_to_string(list_sort(list(DISTINCT finding)), ',')
               AS scrub_finding
      FROM kinds GROUP BY filename)
    SELECT d.doc_id, d.source, d.declared_md5, d.actual_md5,
           (d.declared_md5 = d.actual_md5) AS checksum_ok,
           COALESCE(s.scrub_finding, 'clean') AS scrub_finding
    FROM d LEFT JOIN scrub s ON d.filename = s.filename
    WHERE d.actual_md5 NOT IN (SELECT md5sum FROM registry)
    """,
    doc="P3+J8+C54 (merged): the ingest gate — checksum-equality predicate "
    "(declared md5 from the notify file vs computed md5 of content, "
    "bin/save_DBB_stagein_to_DBB.py:100-109,170-177) composed with the "
    "registry anti-join (only files not already archived are ingested; "
    "duplicates quarantine — is_file_in_archive, "
    "bin/save_DBB_stagein_to_DBB.py:155). The scrub_finding column is the "
    "C54 archive-integrity fold (r6): the REAL maintenance operator "
    "(verify_archive_frames) runs over a synthetic archive/registry pair "
    "derived from documents — %97 bit-rot, %89 size drift, %41 registry "
    "checksum drift, %3 registry membership — and the per-file sorted "
    "finding list rides the gate rows, 'clean' when empty. The "
    "missing_in_archive leg needs names absent from the archive and stays "
    "pytest-covered (test_maintenance).",
)
def q_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..maintenance import verify_archive_frames

    docs = load_table(spark, sf_dir, "documents")
    actual = F.md5(F.col("text").cast("binary"))
    declared = F.when(F.col("doc_id") % 97 == 0, F.md5(F.lit("corrupt"))).otherwise(actual)
    fname = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"))
    registry = docs.where(F.col("doc_id") % 3 == 0).select(actual.alias("md5sum"))
    # C54 synthetic archive: stored checksum = the (possibly corrupt)
    # declared md5; stored size drifts by one byte on the %89 stratum.
    arch = docs.select(
        fname.alias("filename"),
        declared.alias("md5sum"),
        (
            F.octet_length("text").cast("long")
            + F.when(F.col("doc_id") % 89 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("filesize"),
        F.col("text").cast("binary").alias("content"),
    )
    reg_frame = docs.where(F.col("doc_id") % 3 == 0).select(
        fname.alias("filename"),
        F.when(F.col("doc_id") % 41 == 0, F.md5(F.lit("regdrift")))
        .otherwise(actual)
        .alias("md5sum"),
    )
    scrub = (
        verify_archive_frames(arch, reg_frame)
        .groupBy("filename")
        .agg(
            F.array_join(F.array_sort(F.collect_set("finding")), ",").alias(
                "scrub_finding"
            )
        )
    )
    incoming = docs.select(
        "doc_id",
        "source",
        declared.alias("declared_md5"),
        actual.alias("actual_md5"),
        fname.alias("filename"),
    )
    return (
        incoming.join(registry, incoming.actual_md5 == registry.md5sum, "left_anti")
        .join(scrub, "filename", "left")
        .select(
            "doc_id",
            "source",
            "declared_md5",
            "actual_md5",
            (F.col("declared_md5") == F.col("actual_md5")).alias("checksum_ok"),
            F.coalesce("scrub_finding", F.lit("clean")).alias("scrub_finding"),
        )
    )


@query(
    "q_range_inlist",
    oracle="""
    SELECT o_orderkey AS expnum,
           o_custkey AS propid,
           o_orderstatus AS obstype,
           o_orderdate AS date,
           o_totalprice AS exptime
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '2000-12-31'
      AND (o_orderstatus != 'F'
           OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
    """,
    doc="P4+P7: range + disjunctive IN-list predicate with renaming "
    "projection — the SISPI exposure query shape "
    "(bin/monitor_DBB_stagein.py:738,742).",
)
def q_range_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pred = F.col("o_orderdate").between("1998-01-01", "2000-12-31") & (
        (F.col("o_orderstatus") != "F")
        | F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return orders.where(pred).select(
        F.col("o_orderkey").alias("expnum"),
        F.col("o_custkey").alias("propid"),
        F.col("o_orderstatus").alias("obstype"),
        F.col("o_orderdate").alias("date"),
        F.col("o_totalprice").alias("exptime"),
    )


@query(
    "q_column_intersect",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    """,
    doc="P8: column-intersection projection — keep only the columns that "
    "exist in the target table's schema (DBB_BAD_FILE insert, "
    "bin/save_DBB_stagein_to_DBB.py:274-278). The target schema here is "
    "(doc_id, lang, source, rejected_msg); documents lacks rejected_msg.",
)
def q_column_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    target_schema = ["doc_id", "lang", "source", "rejected_msg"]
    keep = [c for c in target_schema if c in docs.columns]
    return docs.select(*keep)

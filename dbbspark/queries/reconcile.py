"""Reconciliation layer — the monitor's core analytics (SURVEY.md §2.3
J3/J4, §2.4 A1/A2/A3).

The reference computes "missing" (delivered by the observatory but absent
from the archive) and "extra" (in the archive but unknown to the
observatory) by looping nested dicts per nite
(`bin/monitor_DBB_stagein.py:1012-1038`). Here each report is a chain of
anti-joins + a grouped count — one shuffle per aggregation, anti-joins
broadcast when a side is small, and the whole report is a single Catalyst
DAG instead of per-nite loops.

Missing/extra definitions (bin/monitor_DBB_stagein.py:5, 1022-1028):
- missing = sispi(delivered) − desdm − failures
- extra   = desdm − sispi(all, delivered or not)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..domain import DESDM_SQL, FAILURES_SQL, NITE_SQL, SISPI_SQL, desdm, failures, sispi
from ..tables import load_table

_RECON_CTES = f"""
    WITH sispi AS ({SISPI_SQL}),
         desdm AS ({DESDM_SQL}),
         fails AS ({FAILURES_SQL}),
         missing AS (
           SELECT s.nite, s.expnum, s.propid, s.obstype
           FROM sispi s
           WHERE s.delivered
             AND s.expnum NOT IN (SELECT expnum FROM desdm)
             AND s.expnum NOT IN (SELECT expnum FROM fails)),
         extra AS (
           SELECT d.nite, d.expnum, d.propid, d.obstype
           FROM desdm d
           WHERE d.expnum NOT IN (SELECT expnum FROM sispi))
"""


def missing_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivered SISPI exposures absent from DESDM and not known-bad —
    the monitor's 'missing' anti-join (bin/monitor_DBB_stagein.py)."""
    s = sispi(spark, sf_dir).where("delivered")
    d = desdm(spark, sf_dir).select("expnum")
    f_ = failures(spark, sf_dir).select("expnum")
    return (
        s.join(d, "expnum", "left_anti")
        .join(f_, "expnum", "left_anti")
        .select("nite", "expnum", "propid", "obstype")
    )


def extra_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESDM rows with no SISPI exposure — the monitor's 'extra' side
    of the reconciliation diff."""
    d = desdm(spark, sf_dir)
    s = sispi(spark, sf_dir).select("expnum")
    return d.join(s, "expnum", "left_anti").select("nite", "expnum", "propid", "obstype")


@query(
    "q_reconcile_anti",
    oracle=_RECON_CTES
    + """
    , mf AS MATERIALIZED (
        SELECT *, printf('DECam_%08d.fits.fz', expnum) AS fn FROM missing),
      xf AS MATERIALIZED (
        SELECT *, printf('DECam_%08d.fits.fz', expnum) AS fn FROM extra),
      ln AS MATERIALIZED (SELECT max(nite) AS v FROM
               (SELECT nite FROM mf UNION ALL SELECT nite FROM xf)),
      -- last-nite residuals as JOINs against the one-row ln, not
      -- scalar-subquery filters on the cross product: DuckDB could not
      -- push `m.nite = (SELECT v FROM ln)` below the cross join, so
      -- levenshtein ran on |mf| x |xf| (14B at sf1 — past the oracle
      -- interrupt budget) instead of the one nite's residuals (~2M)
      mfl AS MATERIALIZED (SELECT mf.* FROM mf JOIN ln ON mf.nite = ln.v),
      xfl AS MATERIALIZED (SELECT xf.* FROM xf JOIN ln ON xf.nite = ln.v),
      pairs AS MATERIALIZED (
        SELECT m.expnum AS m_expnum, x.expnum AS x_expnum,
               levenshtein(m.fn, x.fn) AS d
        FROM mfl m CROSS JOIN xfl x
        WHERE levenshtein(m.fn, x.fn) <= 1),
      best AS (
        SELECT * FROM (
          SELECT pairs.*, row_number() OVER (
            PARTITION BY m_expnum ORDER BY d, x_expnum) AS r1
          FROM pairs) WHERE r1 = 1),
      assigned AS (
        SELECT m_expnum, x_expnum FROM (
          SELECT best.*, row_number() OVER (
            PARTITION BY x_expnum ORDER BY d, m_expnum) AS r2
          FROM best) WHERE r2 = 1)
    SELECT 'missing' AS side, nite, mf.expnum, propid, obstype,
           a.x_expnum AS fuzzy_partner
    FROM mf LEFT JOIN assigned a ON mf.expnum = a.m_expnum
    UNION ALL
    SELECT 'extra' AS side, nite, xf.expnum, propid, obstype,
           a.m_expnum AS fuzzy_partner
    FROM xf LEFT JOIN assigned a ON xf.expnum = a.x_expnum
    """,
    doc="J3+J4+C47 (merged): the two left-anti-join reconciliation "
    "reports — 'missing' (delivered but never archived and not failed, "
    "bin/monitor_DBB_stagein.py:1028) and 'extra' (archived but unknown "
    "to the observatory, bin/monitor_DBB_stagein.py:1023) — tagged and "
    "unioned, PLUS the fuzzy rename pairing for the LATEST nite's "
    "residuals (the daily-reconcile scope the reference's cron runs "
    "live in): `fuzzy_partner` carries the counterpart expnum when the "
    "row's archive filename is within edit distance 1 of a row on the "
    "other side "
    "(monitor.fuzzy_reconcile over the FastSS deletion-neighborhood "
    "route of operators/fuzzy.py — EXACT blocking even on these padded "
    "serial filenames, where the q-gram path's distinguishing grams "
    "drown in hubs; the oracle states the same one-to-one greedy "
    "assignment over the naive cross join, which the blocked rewrite "
    "reproduces exactly).",
    tags=("join", "reconcile", "fuzzy"),
)
def q_reconcile_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..monitor import fuzzy_reconcile
    from ..session import cut_lineage

    fname = F.format_string("DECam_%08d.fits.fz", F.col("expnum"))
    # r7 stage shave: ONE full-outer pass computes BOTH residual sides
    # (missing = s-present & delivered & d-absent, minus failures; extra
    # = d-present & s-absent) where three separate anti-join chains used
    # to re-derive the same relations — one exchange on expnum instead
    # of three, and ONE lineage cut feeds the fuzzy pairing and both
    # output legs. The failures exclusion stays a broadcast anti-join
    # (map-side). missing_df/extra_df keep the standalone anti-join
    # forms for the monitor pages; values are identical REGARDLESS of
    # key duplication: a residual row is by definition one that matched
    # ZERO rows on the other side, and full-outer emits unmatched rows
    # exactly once — duplicate keys can only fan out MATCHED rows,
    # which both residual filters discard.
    s = sispi(spark, sf_dir).select(
        "expnum", "nite", "propid", "obstype", "delivered",
        F.lit(True).alias("_s"),
    )
    d = desdm(spark, sf_dir).select(
        "expnum",
        F.col("nite").alias("x_nite"),
        F.col("propid").alias("x_propid"),
        F.col("obstype").alias("x_obstype"),
        F.lit(True).alias("_d"),
    )
    both = cut_lineage(s.join(d, "expnum", "full"))
    m = (
        both.where(
            F.col("_s").isNotNull() & F.col("delivered") & F.col("_d").isNull()
        )
        .join(failures(spark, sf_dir).select("expnum"), "expnum", "left_anti")
        .select("nite", "expnum", "propid", "obstype")
        .withColumn("fn", fname)
    )
    x = (
        both.where(F.col("_d").isNotNull() & F.col("_s").isNull())
        .select(
            F.col("x_nite").alias("nite"),
            "expnum",
            F.col("x_propid").alias("propid"),
            F.col("x_obstype").alias("obstype"),
        )
        .withColumn("fn", fname)
    )
    latest = (
        m.select("nite").unionByName(x.select("nite")).agg(F.max("nite").alias("_ln"))
    )
    # r13: the `latest` one-row aggregate feeds BOTH fuzzy input sides,
    # and the fuzzy `pairs` relation feeds BOTH output legs — without
    # cuts each consumer re-executes the whole upstream subtree (the
    # max-nite union twice, the FastSS pairing twice: the before plan
    # is 176 operators with four copies of the latest aggregation).
    # Lazy lineage cuts pin each to one execution; `pairs` (the latest
    # nite's one-to-one rename matches — residual-sized by
    # construction) then broadcasts into the two output left joins, so
    # the m/x legs stay map-side over the checkpoint blocks instead of
    # paying Exchange+Sort+SortMergeJoin per leg.
    latest = cut_lineage(latest)
    matches, _, _ = fuzzy_reconcile(
        m.join(F.broadcast(latest), m.nite == F.col("_ln")).select(
            F.col("expnum").alias("m_expnum"), F.col("fn").alias("filename")
        ),
        x.join(F.broadcast(latest), x.nite == F.col("_ln")).select(
            F.col("expnum").alias("x_expnum"), F.col("fn").alias("filename")
        ),
        "filename",
        "m_expnum",
        "x_expnum",
        max_distance=1,
    )
    pairs = cut_lineage(matches.select("m_expnum", "x_expnum"))
    m_out = m.join(
        F.broadcast(pairs), m.expnum == pairs.m_expnum, "left"
    ).select(
        F.lit("missing").alias("side"), "nite", "expnum", "propid", "obstype",
        F.col("x_expnum").alias("fuzzy_partner"),
    )
    x_out = x.join(
        F.broadcast(pairs), x.expnum == pairs.x_expnum, "left"
    ).select(
        F.lit("extra").alias("side"), "nite", "expnum", "propid", "obstype",
        F.col("m_expnum").alias("fuzzy_partner"),
    )
    return m_out.unionByName(x_out)


@query(
    "q_group_count",
    oracle=_RECON_CTES
    + """
    , nites AS (SELECT DISTINCT """
    + NITE_SQL
    + """ AS nite FROM events)
    SELECT n.nite,
           coalesce(s.cnt, 0) AS cnt_sispi,
           coalesce(sd.cnt, 0) AS cnt_delivered,
           coalesce(d.cnt, 0) AS cnt_desdm,
           coalesce(f.cnt, 0) AS cnt_fail,
           coalesce(dup.cnt, 0) AS cnt_dup,
           coalesce(m.cnt, 0) AS cnt_missing,
           coalesce(x.cnt, 0) AS cnt_extra
    FROM nites n
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM sispi GROUP BY nite) s USING (nite)
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM sispi WHERE delivered GROUP BY nite) sd USING (nite)
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM desdm GROUP BY nite) d USING (nite)
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM fails GROUP BY nite) f USING (nite)
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM fails
               WHERE lower(rejected_msg) = 'duplicate file'
               GROUP BY nite) dup USING (nite)
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM missing GROUP BY nite) m USING (nite)
    LEFT JOIN (SELECT nite, COUNT(*) AS cnt FROM extra GROUP BY nite) x USING (nite)
    """,
    doc="A1+A4+P6 (merged): the per-nite reconciliation summary — cnt_sispi/"
    "cnt_delivered/cnt_desdm/cnt_fail/cnt_missing/cnt_extra per nite "
    "(bin/monitor_DBB_stagein.py:1012-1038) — plus cnt_dup, the case-"
    "insensitive duplicate-vs-failure split "
    "(bin/monitor_DBB_stagein.py:848-853,679-684). The flagship query.",
    tags=("agg", "reconcile", "flagship"),
)
def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass rewrite: every domain view (sispi/desdm/failures) is a
    # row-local projection of the SAME events fact table (FIXTURES.md §3),
    # so set membership — and therefore the missing/extra anti-joins — is
    # decidable per row. The whole flagship collapses to one scan + one
    # groupBy(nite) of conditional counts (map-side partial agg, single
    # shuffle). The general multi-table form stays demonstrated by
    # q_anti_missing / q_anti_extra; the oracle SQL is unchanged and still
    # computes via the anti-join CTEs.
    ev = load_table(spark, sf_dir, "events")
    from ..domain import nite_col

    in_sispi = F.col("event_id") % 5 != 0
    delivered = F.col("event_id") % 11 != 0
    in_desdm = F.col("event_id") % 7 != 0
    is_fail = F.col("event_type") == "error"
    # P6: the duplicate split goes through the DERIVED message with a
    # case-insensitive compare (the reference string is 'Duplicate file'),
    # exercising lower()-equality rather than re-testing event_id % 3.
    rejected_msg = F.when(
        F.col("event_id") % 3 == 0, F.lit("Duplicate file")
    ).otherwise(F.lit("md5sum mismatch"))
    is_dup = is_fail & (F.lower(rejected_msg) == "duplicate file")

    def cnt(cond, alias: str):
        return F.coalesce(
            F.count(F.when(cond, 1)), F.lit(0).cast("bigint")
        ).alias(alias)

    return ev.select(
        nite_col(F.col("ts")).alias("nite"),
        in_sispi.alias("s"),
        delivered.alias("dl"),
        in_desdm.alias("d"),
        is_fail.alias("f"),
        is_dup.alias("fd"),
    ).groupBy("nite").agg(
        cnt(F.col("s"), "cnt_sispi"),
        cnt(F.col("s") & F.col("dl"), "cnt_delivered"),
        cnt(F.col("d"), "cnt_desdm"),
        cnt(F.col("f"), "cnt_fail"),
        cnt(F.col("fd"), "cnt_dup"),
        cnt(F.col("s") & F.col("dl") & ~F.col("d") & ~F.col("f"), "cnt_missing"),
        cnt(F.col("d") & ~F.col("s"), "cnt_extra"),
    )


@query(
    "q_group_collect",
    oracle=_RECON_CTES
    + """
    SELECT propid, obstype,
           array_to_string(list_sort(list(expnum)), ',') AS expnums
    FROM missing GROUP BY propid, obstype
    """,
    doc="A2: two-level grouped expnum lists — missing exposures summarized "
    "propid → obstype → [expnums] (bin/monitor_DBB_stagein.py:968-981). "
    "Lists sorted then emitted as comma-joined strings: deterministic AND "
    "hashable by the external driver's canonicalizer (arrays are not).",
    tags=("agg", "reconcile"),
)
def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        missing_df(spark, sf_dir)
        .groupBy("propid", "obstype")
        .agg(
            F.array_join(F.sort_array(F.collect_list("expnum")), ",").alias("expnums")
        )
    )


@query(
    "q_group_collect_set",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           array_to_string(list_sort(list(DISTINCT l_suppkey)), ',') AS suppkeys
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, 3
    """,
    doc="A3: multi-key group + set-valued aggregate — manifest filenames "
    "per (nite, field, band) (bin/monitor_DBB_stagein.py:913-917), on the "
    "lineitem analog per FIXTURES.md §3. Sets sorted then comma-joined "
    "(driver-hashable; see q_group_collect).",
    tags=("agg",),
)
def q_group_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag", "l_linestatus", F.month("l_shipdate").alias("ship_month")
    ).agg(
        F.array_join(F.sort_array(F.collect_set("l_suppkey")), ",").alias("suppkeys")
    )

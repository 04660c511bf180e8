"""The reconciliation monitor, composed end-to-end (SURVEY.md §3.2,
§2.1 S12).

The reference's `monitor_DBB_stagein.py` main flow is gather (two DBs +
logs + HTTP) → summarize (joins/aggs per nite) → render (four HTML
pages). Here the same flow is one Catalyst DAG per page built from the
reconcile/domain layers, with the HTML render as a terminal driver-side
sink over already-aggregated (small) results — the only `toPandas()` in
the engine, and it only ever sees report-sized rows.

Page inventory vs reference:
- summary page     → per-nite count table (`bin/monitor_DBB_stagein.py:522-689`)
- exposure page    → per-exposure state machine rows (`:319-418`), states
                     {fail, missing, not delivered, ok, extra} (F16)
- failures page    → last-20 failures by rejected_date (`:660-672`, O-T1)
- last-events      → newest matching log lines (`:188-263`, W2)
"""

from __future__ import annotations

import html
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import load_all
from .domain import desdm, failures, sispi
from .queries.reconcile import extra_df, missing_df

# --- gather + summarize (all lazy DataFrames; nothing collected) -----------


def exposure_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-exposure state via the reference's presence-flag CASE machine
    (`bin/monitor_DBB_stagein.py:342-366`):

    fail > missing > not delivered > ok (in sispi ∩ desdm) > extra.
    """
    s = sispi(spark, sf_dir).select(
        "nite", "expnum", "propid", "obstype", "delivered"
    )
    d = desdm(spark, sf_dir).select("expnum").withColumn("in_desdm", F.lit(True))
    f_ = failures(spark, sf_dir).select("expnum").withColumn("in_fail", F.lit(True))
    # left joins preserve every observatory exposure; "extra" rows (archive
    # only) come in via the union below.
    enriched = s.join(d, "expnum", "left").join(f_, "expnum", "left")
    state = (
        F.when(F.col("in_fail"), "fail")
        .when(F.col("delivered") & F.col("in_desdm").isNull(), "missing")
        .when(~F.col("delivered"), "not delivered")
        .otherwise("ok")
    )
    observed = enriched.select(
        "nite", "expnum", "propid", "obstype", state.alias("state")
    )
    extras = extra_df(spark, sf_dir).select(
        "nite", "expnum", "propid", "obstype", F.lit("extra").alias("state")
    )
    return observed.unionByName(extras)


def sne_page_df(spark: SparkSession, sf_dir: str, obstype: str = "purchase") -> DataFrame:
    """The SNe page composition (`bin/monitor_DBB_stagein.py:1160-1161`):
    mark_sne_skip (W1 keep-last-per-sequence window dedup) then
    combine_sne_info (J2 left enrichment join with a Y/N presence flag).
    ``obstype`` selects the exposure subset the way the reference's
    'DES supernova' regex does."""
    from pyspark.sql.window import Window

    s = sispi(spark, sf_dir).where(F.col("obstype") == obstype)
    w = Window.partitionBy("propid", "nite").orderBy(F.desc("expnum"))
    marked = s.withColumn("skip", F.row_number().over(w) > 1)
    d = desdm(spark, sf_dir).select(
        "expnum", F.col("exptime").alias("desdm_exptime")
    )
    return (
        marked.join(d, "expnum", "left")
        .select(
            "nite",
            "expnum",
            "propid",
            "skip",
            F.when(F.col("desdm_exptime").isNotNull(), "Y")
            .otherwise("N")
            .alias("in_archive"),
            F.coalesce(F.col("desdm_exptime"), F.lit(0.0)).alias("exptime"),
        )
    )


def nite_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship per-nite count table (q_group_count)."""
    return load_all()["q_group_count"].builder(spark, sf_dir)


def recent_failures(spark: SparkSession, sf_dir: str, depth: int = 20) -> DataFrame:
    """Last-N failures by rejected_date desc (O-T1; reference depth 20,
    `bin/monitor_DBB_stagein.py:660-672`). TakeOrderedAndProject — no
    global sort."""
    return (
        failures(spark, sf_dir)
        .orderBy(F.desc("rejected_date"), F.desc("expnum"))
        .limit(depth)
    )


# --- render (terminal sink; input DataFrames are report-sized) -------------

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 1.5em; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #999; padding: 2px 8px; text-align: left; }}
 tr.state-fail td {{ background: #fbb; }}
 tr.state-missing td {{ background: #fdb; }}
 tr.state-extra td {{ background: #bdf; }}
 td.band-0 {{ background: #eef; }}
 td.band-1 {{ background: #efe; }}
</style></head>
<body><h1>{title}</h1>
{nav}
{body}
</body></html>
"""

# Relative links between the generated pages — the reference's summary
# page carries the same <li> scaffolding to its sibling reports
# (bin/monitor_DBB_stagein.py:563-566); &nbsp; spacing matches its
# null-cell convention.
_NAV = (
    '<ul class="nav">'
    '<li><a href="summary.html">Nightly summary</a>&nbsp;</li>'
    '<li><a href="exposures.html">Exposures by state</a>&nbsp;</li>'
    '<li><a href="failures.html">Recent failures</a>&nbsp;</li>'
    '<li><a href="sne.html">SNe exposures</a>&nbsp;</li>'
    "</ul>"
)


def _table(
    df: DataFrame,
    row_class_col: str | None = None,
    max_rows: int = 10000,
    cycle_col: str | None = None,
) -> str:
    """Render a small DataFrame as an HTML table. Guard-railed: refuses to
    collect more than `max_rows` (report sinks are for aggregates, not
    data). ``cycle_col`` alternates that column's cell color each time
    its value changes between consecutive rows — the reference's
    per-nite color cycling (bin/monitor_DBB_stagein.py:26,382-383)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report table exceeds {max_rows} rows — aggregate before rendering"
        )
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body_rows = []
    band, prev_cycle = 0, object()
    for r in rows:
        cls = (
            f' class="state-{html.escape(str(r[row_class_col]))}"'
            if row_class_col and r[row_class_col] is not None
            else ""
        )
        if cycle_col is not None and r[cycle_col] != prev_cycle:
            band, prev_cycle = (band + 1) % 2, r[cycle_col]
        # missing values render as &nbsp; like the reference
        # (bin/monitor_DBB_stagein.py:370-372)
        cells = "".join(
            "<td{}>{}</td>".format(
                f' class="band-{band}"' if c == cycle_col else "",
                "&nbsp;" if r[c] is None else html.escape(str(r[c])),
            )
            for c in cols
        )
        body_rows.append(f"<tr{cls}>{cells}</tr>")
    return f"<table><tr>{head}</tr>{''.join(body_rows)}</table>"


@dataclass(frozen=True)
class MonitorReport:
    summary_html: str
    exposures_html: str
    failures_html: str
    sne_html: str


def build_report(
    spark: SparkSession,
    sf_dir: str,
    num_nites: int = 14,
    variant: str = "short",
) -> MonitorReport:
    """Run the monitor DAGs and render the four report pages (the
    reference's page inventory, `bin/monitor_DBB_stagein.py:1155-1162`).

    Row-level pages (exposures, SNe) cover only the most recent
    ``num_nites`` nites — the reference's report window (default 14,
    `bin/monitor_DBB_stagein.py:25`). ``variant`` mirrors the
    reference's short/full exposure-page variants (`:319-418`): "short"
    lists only problem exposures (fail/missing/extra — bounded by the
    problem rate at any scale), "full" lists every exposure in the
    window."""
    # Dense: empty nites render as all-zero rows, matching the
    # reference's explicit nite-range walk (see densify_nites).
    summary = densify_nites(nite_summary(spark, sf_dir)).orderBy(F.desc("nite"))
    recent = F.broadcast(
        summary.select("nite").orderBy(F.desc("nite")).limit(num_nites)
    )
    states = (
        exposure_states(spark, sf_dir)
        .join(recent, "nite", "left_semi")
        .orderBy(F.desc("nite"), F.desc("expnum"))
    )
    if variant == "short":
        states = states.where(F.col("state").isin("fail", "missing", "extra"))
    fails = recent_failures(spark, sf_dir)
    sne = (
        sne_page_df(spark, sf_dir)
        .join(recent, "nite", "left_semi")
        .orderBy(F.desc("nite"), F.desc("expnum"))
    )
    return MonitorReport(
        summary_html=_PAGE.format(
            title="DBB stage-in nightly summary",
            nav=_NAV,
            body=_table(summary)
        ),
        exposures_html=_PAGE.format(
            title=f"Exposures by state ({variant})",
            nav=_NAV,
            body=_table(
                states,
                row_class_col="state",
                max_rows=100_000,
                cycle_col="nite",
            ),
        ),
        failures_html=_PAGE.format(
            title="Recent failures", nav=_NAV, body=_table(fails)
        ),
        sne_html=_PAGE.format(
            title="SNe exposures",
            nav=_NAV,
            body=_table(sne, max_rows=100_000, cycle_col="nite"),
        ),
    )


def write_report(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    num_nites: int = 14,
    variant: str = "short",
) -> MonitorReport:
    """Materialize the report pages to ``out_dir`` (the reference's cron
    target directory)."""
    import os

    report = build_report(spark, sf_dir, num_nites=num_nites, variant=variant)
    os.makedirs(out_dir, exist_ok=True)
    for name, content in (
        ("summary.html", report.summary_html),
        ("exposures.html", report.exposures_html),
        ("failures.html", report.failures_html),
        ("sne.html", report.sne_html),
    ):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(content)
    return report


def funnel_page(waterfall: list[dict], title: str = "Curation funnel") -> str:
    """Render a C45 funnel waterfall (operators/funnel.py) in the same
    guard-railed page shape as the reconciliation reports — the
    curation-side sibling of the reference's per-stage accounting pages
    (its quarantine reasons table, bin/save_DBB_stagein_to_DBB.py:212-215
    routed per first failed check). Driver-side input: the waterfall is
    ≤ n_stages rows by construction, so no collect guard is needed."""
    if not waterfall:
        return _PAGE.format(title=title, nav="", body="<p>empty funnel</p>")
    cols = list(waterfall[0].keys())
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    body_rows = []
    for row in waterfall:
        cells = "".join(
            "<td>{}</td>".format(
                "&nbsp;"
                if row.get(c) is None
                else html.escape(
                    f"{row[c]:.2%}" if c == "drop_rate" else str(row[c])
                )
            )
            for c in cols
        )
        body_rows.append(f"<tr>{cells}</tr>")
    table = f"<table><tr>{head}</tr>{''.join(body_rows)}</table>"
    return _PAGE.format(title=title, nav="", body=table)


def drift_page(findings: list[dict], title: str = "Profile drift") -> str:
    """Render C46 `profile_drift` findings as a report page — the
    recurring-ingest sibling of the funnel page: each finding is one
    row (column, kind, before → after), kind-colored like the
    reconciliation states (vanished/type_change red, null_rate_jump
    orange, appeared/distinct_shift blue)."""
    if not findings:
        return _PAGE.format(
            title=title, nav="", body="<p>no drift — profiles agree</p>"
        )
    state = {
        "vanished": "fail", "type_change": "fail",
        "null_rate_jump": "missing",
        "appeared": "extra", "distinct_shift": "extra",
    }
    head = "<th>column</th><th>kind</th><th>before</th><th>after</th>"
    rows = []
    for f in findings:
        cls = state.get(f["kind"], "")
        cells = "".join(
            "<td>{}</td>".format(
                "&nbsp;" if f.get(k) is None else html.escape(str(f.get(k)))
            )
            for k in ("column", "kind", "before", "after")
        )
        rows.append(f'<tr class="state-{cls}">{cells}</tr>' if cls else f"<tr>{cells}</tr>")
    table = f"<table><tr>{head}</tr>{''.join(rows)}</table>"
    return _PAGE.format(title=title, nav="", body=table)


def densify_nites(summary: DataFrame, nite_col_name: str = "nite") -> DataFrame:
    """Make the per-nite summary DENSE: one row per calendar nite between
    the earliest and latest observed (counts 0 for empty nites).

    The reference's monitor walks an explicit last-N-nites list, so a
    nite with zero arrivals still renders as a row — a grouped
    aggregate omits it, and an omitted nite reads as "no page row"
    instead of the loud all-zero line an operator should see
    (`bin/monitor_DBB_stagein.py:707-715`). C48's spine join
    (operators/timegrid.py) restores parity: nite strings (yyyyMMdd)
    → dates, one-day spine, fill all count columns with 0."""
    from .operators.timegrid import fill_time_gaps

    as_date = summary.withColumn(
        "_nite_d", F.to_date(F.col(nite_col_name), "yyyyMMdd")
    ).drop(nite_col_name)
    counts = [c for c in summary.columns if c != nite_col_name]
    dense = fill_time_gaps(
        as_date,
        "_nite_d",
        "INTERVAL 1 DAY",
        fill={c: 0 for c in counts},
    )
    return dense.select(
        F.date_format("_nite_d", "yyyyMMdd").alias(nite_col_name), *counts
    )


def fuzzy_reconcile(
    missing: DataFrame,
    extra: DataFrame,
    key: str,
    id_missing: str,
    id_extra: str,
    max_distance: int = 2,
):
    """C47 wired into reconciliation (VERDICT r4 item 4): after the
    exact anti-joins, a file that was RENAMED between the two systems
    reports as one `missing` row plus one `extra` row — a double report
    the reference's regex reconciliation was meant to collapse
    (`bin/monitor_DBB_stagein.py:844,1023,1028`). This pairs the
    residual missing × extra sets on a drifted string key via
    `operators.fuzzy.fuzzy_join` and returns

        (matches, missing_residual, extra_residual)

    where `matches` is a deterministic one-to-one assignment: each
    missing row takes its best (lowest-distance, lowest-id) extra row,
    and each extra row is claimed by at most one missing row (two-pass
    greedy — the standard record-linkage tiebreak, not global optimum).
    Residuals are what's STILL missing/extra after renames pair up.

    The blocking inside fuzzy_join keeps this at scale: residual sets
    are small by construction (reconciliation converges), and even bulk
    drift never goes |missing|×|extra| — candidates come from shared
    positional q-grams."""
    from .operators.fuzzy import fuzzy_join

    pairs = fuzzy_join(
        missing, extra, key,
        max_distance=max_distance, id_a=id_missing, id_b=id_extra,
        # the min_by aggregations below collapse multi-variant duplicate
        # pairs for free — skip the join's own distinct exchange; and
        # residual sides are small by construction, so skip the
        # parallelism re-spread too (r7 stage shave: each saved exchange
        # is a saved AQE job)
        distinct=False,
        respread=False,
    )
    # Greedy one-to-one via min_by aggregations, not rank windows (r7
    # stage shave): each pass is a partial-aggregated groupBy — map-side
    # combine shrinks the exchange to one row per key before it moves,
    # where a row_number window shuffles every pair row and sorts whole
    # partitions. Tie order matches the window form exactly: min over
    # the (distance, counterpart-id) struct = row_number 1 under
    # ORDER BY distance, id (pair rows are unique per (m,x), so the
    # struct ordering is total).
    best = pairs.groupBy(id_missing).agg(
        F.min_by(
            F.struct(id_extra, "key_a", "key_b", "distance"),
            F.struct("distance", id_extra),
        ).alias("_b")
    ).select(id_missing, "_b.*")
    matches = best.groupBy(id_extra).agg(
        F.min_by(
            F.struct(id_missing, "key_a", "key_b", "distance"),
            F.struct("distance", id_missing),
        ).alias("_b")
    ).select(id_extra, "_b.*")
    missing_residual = missing.join(
        matches.select(id_missing), id_missing, "left_anti"
    )
    extra_residual = extra.join(
        matches.select(id_extra), id_extra, "left_anti"
    )
    return matches, missing_residual, extra_residual


def reconcile_with_renames(
    spark: SparkSession, sf_dir: str, max_distance: int = 1
):
    """Monitor-level composition: derive the archive filename for the
    exact-reconcile residuals (the reference's `DECam_<expnum>.fits.fz`
    naming, bin/monitor_DBB_stagein.py:844) and pair renamed files.
    Returns (matches, missing_residual, extra_residual)."""
    fname = F.format_string("DECam_%08d.fits.fz", F.col("expnum"))
    m = missing_df(spark, sf_dir).select(
        F.col("expnum").alias("m_expnum"), fname.alias("filename")
    )
    x = extra_df(spark, sf_dir).select(
        F.col("expnum").alias("x_expnum"), fname.alias("filename")
    )
    return fuzzy_reconcile(
        m, x, "filename", "m_expnum", "x_expnum", max_distance
    )

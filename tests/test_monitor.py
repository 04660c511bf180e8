"""Monitor composition invariants (SURVEY.md §3.2, §5 item 3).

The per-exposure state machine must tile the universe: every sispi
exposure gets exactly one state, extras appear exactly once, and the
state counts reconcile with the flagship per-nite summary.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbbspark.domain import sispi
from dbbspark.monitor import (
    build_report,
    exposure_states,
    nite_summary,
    recent_failures,
    write_report,
)
from dbbspark.queries.reconcile import extra_df, missing_df


def test_states_partition_universe(spark, sf_dir):
    states = exposure_states(spark, sf_dir)
    # one row per sispi exposure + one per extra
    n_sispi = sispi(spark, sf_dir).count()
    n_extra = extra_df(spark, sf_dir).count()
    assert states.count() == n_sispi + n_extra
    assert states.groupBy("expnum", "state").count().where("count > 1").count() == 0

    by_state = {
        r["state"]: r["cnt"]
        for r in states.groupBy("state").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_state.get("extra", 0) == n_extra
    assert by_state.get("missing", 0) == missing_df(spark, sf_dir).count()


def test_state_counts_match_summary(spark, sf_dir):
    states = exposure_states(spark, sf_dir)
    summary = nite_summary(spark, sf_dir)
    m_states = {
        r["nite"]: r["cnt"]
        for r in states.where("state = 'missing'").groupBy("nite").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    m_summary = {
        r["nite"]: r["cnt_missing"]
        for r in summary.collect()
        if r["cnt_missing"] > 0
    }
    assert m_states == m_summary


def test_sne_page_dedup_and_enrichment(spark, sf_dir):
    from dbbspark.monitor import sne_page_df

    sne = sne_page_df(spark, sf_dir)
    # keep-last semantics: exactly one non-skip row per (propid, nite)
    keepers = sne.where("NOT skip").groupBy("propid", "nite").count()
    assert keepers.where("count != 1").count() == 0
    # presence flag consistent with the enrichment join
    assert sne.where("in_archive = 'N' AND exptime != 0.0").count() == 0


def test_report_renders(spark, sf_dir, tmp_path):
    report = write_report(spark, sf_dir, str(tmp_path / "report"))
    assert os.path.exists(tmp_path / "report" / "summary.html")
    assert os.path.exists(tmp_path / "report" / "sne.html")
    assert "<table>" in report.summary_html
    assert "state-missing" in report.exposures_html
    # per-nite color cycling on the nite column, both bands present
    # (reference: bin/monitor_DBB_stagein.py:26,382-383)
    assert 'class="band-0"' in report.exposures_html
    assert 'class="band-1"' in report.exposures_html
    fails = recent_failures(spark, sf_dir, depth=5)
    assert fails.count() <= 5
    # TakeOrderedAndProject, not a global sort
    plan = fails._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_funnel_page_renders_waterfall():
    from dbbspark.monitor import funnel_page

    waterfall = [
        {"stage": "dedup", "reached": 100, "dropped": 10,
         "survived_after": 90, "drop_rate": 0.1, "tokens_dropped": 400},
        {"stage": "quality", "reached": 90, "dropped": 0,
         "survived_after": 90, "drop_rate": 0.0, "tokens_dropped": 0},
    ]
    page = funnel_page(waterfall)
    assert "<table>" in page and "dedup" in page and "quality" in page
    assert "10.00%" in page  # drop_rate formatted as a percentage
    assert "<th>stage</th>" in page
    assert funnel_page([]).count("empty funnel") == 1


def test_drift_page_renders_findings():
    from dbbspark.monitor import drift_page

    findings = [
        {"column": "tags", "kind": "vanished"},
        {"column": "name", "kind": "null_rate_jump", "before": 0.0, "after": 0.4},
        {"column": "id", "kind": "distinct_shift", "before": 100, "after": 7,
         "ratio": 0.07},
    ]
    page = drift_page(findings)
    assert 'class="state-fail"' in page and 'class="state-missing"' in page
    assert "null_rate_jump" in page and "0.4" in page
    assert "no drift" in drift_page([])


def test_densify_nites_fills_gap_with_zeros(spark):
    from dbbspark.monitor import densify_nites

    sparse = spark.createDataFrame(
        [("20240101", 5, 2), ("20240104", 1, 0)],
        "nite string, n_delivered long, n_missing long",
    )
    rows = {r["nite"]: r for r in densify_nites(sparse).collect()}
    assert sorted(rows) == ["20240101", "20240102", "20240103", "20240104"]
    assert rows["20240102"]["n_delivered"] == 0
    assert rows["20240103"]["n_missing"] == 0
    assert rows["20240101"]["n_delivered"] == 5


def test_fuzzy_reconcile_pairs_renamed_files(spark):
    """VERDICT r4 item 4: planted renamed files must report as MATCHES,
    not as one missing + one extra; genuinely unmatched rows stay in the
    residuals; each extra row is claimed at most once."""
    from pyspark.sql import functions as F

    from dbbspark.monitor import fuzzy_reconcile

    missing = spark.createDataFrame(
        [
            (1, "decam_00000123.fits.fz"),   # renamed: case drifted
            (2, "DECam_00000456.fits.fz"),   # renamed: one digit retyped
            (3, "DECam_00000789.fits.fz"),   # truly missing (no partner)
        ],
        "m_id long, filename string",
    )
    extra = spark.createDataFrame(
        [
            (10, "DECam_00000123.fits.fz"),
            (11, "DECam_00000457.fits.fz"),
            (12, "completely_other_file.bin"),  # truly extra
        ],
        "x_id long, filename string",
    )
    matches, m_res, x_res = fuzzy_reconcile(
        missing, extra, "filename", "m_id", "x_id", max_distance=1
    )
    got = {(r["m_id"], r["x_id"]) for r in matches.collect()}
    assert got == {(1, 10), (2, 11)}
    assert [r["m_id"] for r in m_res.collect()] == [3]
    assert [r["x_id"] for r in x_res.collect()] == [12]


def test_fuzzy_reconcile_one_to_one_assignment(spark):
    """Two missing rows near one extra row: only the best (lowest
    distance, then lowest id) claims it; the loser stays missing."""
    from dbbspark.monitor import fuzzy_reconcile

    missing = spark.createDataFrame(
        [(1, "file_000a.dat"), (2, "file_000b.dat")], "m_id long, filename string"
    )
    extra = spark.createDataFrame(
        [(10, "file_000b.dat")], "x_id long, filename string"
    )
    matches, m_res, x_res = fuzzy_reconcile(
        missing, extra, "filename", "m_id", "x_id", max_distance=1
    )
    got = {(r["m_id"], r["x_id"], r["distance"]) for r in matches.collect()}
    assert got == {(2, 10, 0)}  # exact match beats distance-1
    assert [r["m_id"] for r in m_res.collect()] == [1]
    assert x_res.count() == 0


def test_monitor_cli_fuzzy_keys(sf_dir, tmp_path, capsys):
    import json

    from dbbspark import cli

    rc = cli.main(
        ["monitor", "--sf-dir", sf_dir, "--out", str(tmp_path / "rep"),
         "--fuzzy-keys"]
    )
    assert rc == 0
    line = next(
        json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith('{"renamed_matches"')
    )
    # serial DECam names make distance-1 neighbors; the contract here is
    # the accounting: every fuzzy match removes exactly one row from
    # EACH residual side
    assert line["renamed_matches"] >= 0
    assert line["missing_after_fuzzy"] >= 0 and line["extra_after_fuzzy"] >= 0

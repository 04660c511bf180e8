"""Crash injection INSIDE the stage+two-rename swap windows
(VERDICT r10 item 3 + ADVICE r10 medium #2).

Every swap-based rewrite (remove_from_index, compact_partitioned,
takedown's archive and registry legs) has a two-rename window: the live
partition is renamed OUT to backup, then staging is renamed IN. A crash
between the renames leaves the partition MISSING while staging and
backup both hold it — before the r11 fix a re-run saw no rows for the
partition (no hits), never restored it, and takedown's registry leg
flagged every NON-TARGET sibling row missing_in_archive until a manual
restore, despite the docstring's "crash mid-way → re-run" promise.

The injection is real: `_fs_and_path` is monkeypatched to hand back a
proxy FileSystem whose Nth rename raises — the exact fault shape of a
process kill after rename-out committed. Each test then re-runs the SAME
operation unpatched and pins that `_heal_interrupted_swaps` restores the
parked partition (staging presence disambiguates an interrupted swap
from a legitimately-emptied partition) and the re-run finishes with the
exact expected row multiset.
"""

from __future__ import annotations

import os

import pytest

import dbbspark.maintenance as maint
from dbbspark.maintenance import (
    compact_partitioned,
    remove_from_index,
    takedown,
    verify_archive,
)
from dbbspark.streaming.ingest import ingest_batch

from tests.test_ingest import _cfg, _stage, area  # noqa: F401  (fixture)


class _FlakyFS:
    """Proxy around the JVM Hadoop FileSystem whose Nth rename call
    raises — simulating a hard crash with rename-out committed and
    rename-in never issued."""

    def __init__(self, fs, fail_on_call: int):
        self._fs = fs
        self._calls = 0
        self._fail_on = fail_on_call

    def rename(self, src, dst):
        self._calls += 1
        if self._calls == self._fail_on:
            raise RuntimeError(
                f"injected crash: rename #{self._calls} ({src} -> {dst})"
            )
        return self._fs.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._fs, name)


def _patch_flaky(monkeypatch, fail_on_call: int):
    real = maint._fs_and_path

    def flaky(spark, path):
        fs, hpath, jvm = real(spark, path)
        return _FlakyFS(fs, fail_on_call), hpath, jvm

    monkeypatch.setattr(maint, "_fs_and_path", flaky)
    return real


def test_remove_from_index_crash_between_renames_heals(
    spark, tmp_path, monkeypatch
):
    idx = str(tmp_path / "idx")
    rows = [(f"m{i}", i % 2) for i in range(10)]
    spark.createDataFrame(rows, "mid string, batch int").write.partitionBy(
        "batch"
    ).parquet(idx)

    # rename #1 = batch=0 -> backup, rename #2 = staging -> batch=0:
    # crash exactly between the two renames of the first affected swap
    real = _patch_flaky(monkeypatch, fail_on_call=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        remove_from_index(spark, idx, ["m0", "m2"], id_col="mid")

    # the hazard state is real: the partition is gone from the live read
    monkeypatch.setattr(maint, "_fs_and_path", real)
    assert not os.path.exists(os.path.join(idx, "batch=0"))
    assert {r["mid"] for r in spark.read.parquet(idx).collect()} == {
        f"m{i}" for i in range(10) if i % 2 == 1
    }

    # re-run: heal restores the parked partition, the removal completes
    out = remove_from_index(spark, idx, ["m0", "m2"], id_col="mid")
    assert out["removed_rows"] == 2
    assert {r["mid"] for r in spark.read.parquet(idx).collect()} == {
        "m4", "m6", "m8", "m1", "m3", "m5", "m7", "m9",
    }
    # and a further re-run is still a no-op (idempotence preserved)
    again = remove_from_index(spark, idx, ["m0", "m2"], id_col="mid")
    assert again["removed_rows"] == 0


def test_takedown_archive_crash_between_renames_heals(
    spark, area, monkeypatch  # noqa: F811
):
    """The exact ADVICE r10 scenario: the crashed swap strands the
    partition's NON-TARGET sibling rows in .pre-takedown; the re-run
    must restore them, finish the removal, and leave archive+registry
    scrub-consistent."""
    # second raw file in the SAME (filetype, nite, batch) leaf so the
    # takedown partition rewrite has survivors (n_after > 0 => staging
    # swap => a two-rename window exists)
    _stage(area, "DECam_00000009.fits", b"EXPNUM = 9\nOBSTYPE = object\nnew")
    cfg = _cfg(area)
    res = ingest_batch(spark, cfg)
    assert res.archived == 3

    real = _patch_flaky(monkeypatch, fail_on_call=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        takedown(
            spark,
            ["DECam_00000001.fits"],
            archive_root=cfg.archive_root,
            registry_path=cfg.registry_path,
            quarantine_path=cfg.quarantine_path,
            reason="takedown: crash test",
        )
    monkeypatch.setattr(maint, "_fs_and_path", real)

    # hazard state: the sibling row vanished with the parked partition —
    # the scrub reports it missing while the registry still lists it
    names_now = {
        r["filename"]
        for r in spark.read.option("mergeSchema", "true")
        .parquet(cfg.archive_root)
        .collect()
    }
    assert "DECam_00000009.fits" not in names_now
    findings = verify_archive(
        spark, cfg.archive_root, registry_path=cfg.registry_path
    ).collect()
    assert "missing_in_archive" in {f["finding"] for f in findings}

    # the documented remediation — re-run the SAME takedown — now
    # completes the interrupted swap instead of seeing "no hits"
    out = takedown(
        spark,
        ["DECam_00000001.fits"],
        archive_root=cfg.archive_root,
        registry_path=cfg.registry_path,
        quarantine_path=cfg.quarantine_path,
        reason="takedown: crash test",
    )
    assert out["archive_removed"] == 1
    names = {
        r["filename"]
        for r in spark.read.option("mergeSchema", "true")
        .parquet(cfg.archive_root)
        .collect()
    }
    assert names == {"DECam_00000009.fits", "manifest_SN_X1.json"}
    assert {
        r["filename"] for r in spark.read.parquet(cfg.registry_path).collect()
    } == names
    assert (
        verify_archive(
            spark, cfg.archive_root, registry_path=cfg.registry_path
        ).count()
        == 0
    )


def test_takedown_registry_crash_between_renames_heals(
    spark, area, monkeypatch  # noqa: F811
):
    cfg = _cfg(area)
    ingest_batch(spark, cfg)

    # registry-only takedown (the registry is nite-partitioned since
    # r11, so the swap is per nite partition): rename #1 = nite=X ->
    # backup, rename #2 = staging -> nite=X
    real = _patch_flaky(monkeypatch, fail_on_call=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        takedown(
            spark, ["DECam_00000001.fits"], registry_path=cfg.registry_path
        )
    monkeypatch.setattr(maint, "_fs_and_path", real)
    # the matched nite partition is parked in backup (both fixture rows
    # share one nite, so the registry shows no nite= dirs mid-crash)
    assert not any(
        d.startswith("nite=") for d in os.listdir(cfg.registry_path)
    )

    out = takedown(
        spark, ["DECam_00000001.fits"], registry_path=cfg.registry_path
    )
    assert out["registry_removed"] == 1
    assert {
        r["filename"] for r in spark.read.parquet(cfg.registry_path).collect()
    } == {"manifest_SN_X1.json"}


def test_compact_crash_between_renames_heals(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "ds")
    rows = [(i, i % 3, f"v{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, p int, v string")
    df.repartition(6).write.partitionBy("p").parquet(path)

    real = _patch_flaky(monkeypatch, fail_on_call=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_partitioned(spark, path, ["p"])
    monkeypatch.setattr(maint, "_fs_and_path", real)
    assert not os.path.exists(path)  # crashed mid-swap: root renamed away

    backup = compact_partitioned(spark, path, ["p"])
    got = {(r["id"], r["p"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == set(rows)
    # contract unchanged: backup holds the pre-compaction dataset
    assert spark.read.parquet(backup).count() == 30


def test_compact_heals_mid_flight_staging_write(spark, tmp_path):
    """A staging WRITE that crashed mid-flight (no _SUCCESS, only a
    _temporary committer skeleton) leaves the staging root + intermediate
    dirs in place with the live dataset intact. The leaf-only heal of r11
    deleted the skeleton's leaves but kept the root, so the compact
    paths' mode('errorifexists') write failed with 'path already exists'
    on every re-run until manual cleanup (ADVICE r11 medium #2). The heal
    now drops the whole staging root; both compact entrypoints must
    succeed directly over the debris."""
    from dbbspark.maintenance import compact_gate_index

    path = str(tmp_path / "ds")
    rows = [(i, i % 3, f"v{i}") for i in range(30)]
    spark.createDataFrame(rows, "id long, p int, v string").repartition(
        6
    ).write.partitionBy("p").parquet(path)

    # fabricate the committer skeleton of a crashed staging write
    skel = tmp_path / "ds.compact-staging" / "_temporary" / "0" / "task_0"
    skel.mkdir(parents=True)
    (skel / "part-00000.parquet.tmp").write_bytes(b"partial")

    compact_partitioned(spark, path, ["p"])
    got = {(r["id"], r["p"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == set(rows)

    idx = str(tmp_path / "gidx")
    spark.createDataFrame(
        [(f"m{i}", i % 2) for i in range(8)], "mid string, batch int"
    ).write.partitionBy("batch").parquet(idx)
    gskel = tmp_path / "gidx.compact-staging" / "_temporary" / "0"
    gskel.mkdir(parents=True)
    (gskel / "stale.tmp").write_bytes(b"partial")
    compact_gate_index(spark, idx)
    assert spark.read.parquet(idx).count() == 8


def test_compact_gate_index_crash_between_renames_heals(
    spark, tmp_path, monkeypatch
):
    """compact_gate_index shares the whole-root two-rename swap; a crash
    between its renames parks the entire gate index in .pre-compact. The
    re-run must restore it, clear the stale staging (which would
    otherwise fail the errorifexists write), and finish the compaction
    with the exact row multiset in batch=-1."""
    from dbbspark.maintenance import compact_gate_index

    idx = str(tmp_path / "gate_idx")
    rows = [(f"m{i}", i % 4) for i in range(12)]
    spark.createDataFrame(rows, "mid string, batch int").write.partitionBy(
        "batch"
    ).parquet(idx)

    real = _patch_flaky(monkeypatch, fail_on_call=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_gate_index(spark, idx)
    monkeypatch.setattr(maint, "_fs_and_path", real)
    assert not os.path.exists(idx)  # whole index parked mid-swap

    backup = compact_gate_index(spark, idx)
    got = spark.read.parquet(idx)
    assert {r["mid"] for r in got.collect()} == {f"m{i}" for i in range(12)}
    assert {r["batch"] for r in got.select("batch").distinct().collect()} == {
        -1
    }
    assert spark.read.parquet(backup).count() == 12

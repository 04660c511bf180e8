"""Composed takedown (maintenance.takedown + cli takedown): the engine
form of the reference's quarantine-out-of-archive move
(`bin/save_DBB_stagein_to_DBB.py:244-267`) extended across every surface
that remembers a file — archive partitions, registry, quarantine audit
trail, dedup-gate indexes (C59). The contract under test: after a
takedown the file is GONE from the data plane, its audit row exists, the
C54 scrub sees a CONSISTENT pair, and a re-submission of the same
content is ACCEPTED (duplicate gate re-opened)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbbspark.maintenance import takedown, verify_archive
from dbbspark.streaming.ingest import REASON_DUPLICATE, ingest_batch

from tests.test_ingest import _cfg, _stage, area  # noqa: F401  (fixture)


def _archive_names(spark, cfg):
    return {
        r["filename"]
        for r in spark.read.option("mergeSchema", "true")
        .parquet(cfg.archive_root)
        .select("filename")
        .collect()
    }


def test_takedown_composed(spark, area):  # noqa: F811
    cfg = _cfg(area)
    first = ingest_batch(spark, cfg)
    assert first.archived == 2
    assert _archive_names(spark, cfg) == {
        "DECam_00000001.fits", "manifest_SN_X1.json",
    }

    out = takedown(
        spark,
        ["DECam_00000001.fits"],
        archive_root=cfg.archive_root,
        registry_path=cfg.registry_path,
        quarantine_path=cfg.quarantine_path,
        reason="takedown: test",
    )
    assert out["archive_removed"] == 1
    assert out["registry_removed"] == 1
    assert out["quarantined"] == 1

    # data plane: gone from archive AND registry, sibling intact
    assert _archive_names(spark, cfg) == {"manifest_SN_X1.json"}
    reg = spark.read.parquet(cfg.registry_path)
    assert {r["filename"] for r in reg.collect()} == {"manifest_SN_X1.json"}

    # audit trail: one quarantine row with the reason
    q = spark.read.parquet(cfg.quarantine_path)
    td_rows = q.where(F.col("rejected_msg") == "takedown: test").collect()
    assert [r["orig_filename"] for r in td_rows] == ["DECam_00000001.fits"]

    # C54 consistency: archive and registry agree after the takedown
    findings = verify_archive(
        spark, cfg.archive_root, registry_path=cfg.registry_path
    )
    assert findings.count() == 0

    # idempotent re-run removes nothing further
    again = takedown(
        spark,
        ["DECam_00000001.fits"],
        archive_root=cfg.archive_root,
        registry_path=cfg.registry_path,
        quarantine_path=cfg.quarantine_path,
    )
    assert again["archive_removed"] == 0
    assert again["registry_removed"] == 0
    assert again["quarantined"] == 0


def test_takedown_reopens_duplicate_gate(spark, area):  # noqa: F811
    cfg = _cfg(area)
    ingest_batch(spark, cfg)
    takedown(
        spark,
        ["DECam_00000001.fits"],
        archive_root=cfg.archive_root,
        registry_path=cfg.registry_path,
    )
    # the same stage-in contents re-presented: the taken-down file is
    # judged FRESH again (re-archived); the untouched sibling stays a
    # duplicate
    res = ingest_batch(spark, cfg)
    assert res.archived == 1
    assert res.by_reason[REASON_DUPLICATE] == 1
    assert _archive_names(spark, cfg) == {
        "DECam_00000001.fits", "manifest_SN_X1.json",
    }
    assert spark.read.parquet(cfg.registry_path).count() == 2


def test_takedown_partial_crash_heals(spark, area):  # noqa: F811
    """A crash between the archive rewrite and the registry rewrite
    leaves a registry row pointing nowhere. The contract (docstring
    order note): C54's scrub NAMES the inconsistency as
    missing_in_archive, and a takedown re-run is the remediation."""
    cfg = _cfg(area)
    ingest_batch(spark, cfg)

    # "crash" after the archive (+audit) leg: run takedown WITHOUT the
    # registry leg — exactly the partial state a mid-run crash leaves
    partial = takedown(
        spark,
        ["DECam_00000001.fits"],
        archive_root=cfg.archive_root,
        quarantine_path=cfg.quarantine_path,
    )
    assert partial["archive_removed"] == 1
    assert partial["quarantined"] == 1  # intent log already written

    findings = verify_archive(
        spark, cfg.archive_root, registry_path=cfg.registry_path
    ).collect()
    assert [f["finding"] for f in findings] == ["missing_in_archive"]

    # remediation: re-run the FULL takedown — archive leg is a no-op,
    # registry leg completes, the pair is consistent again
    heal = takedown(
        spark,
        ["DECam_00000001.fits"],
        archive_root=cfg.archive_root,
        registry_path=cfg.registry_path,
        quarantine_path=cfg.quarantine_path,
    )
    assert heal["archive_removed"] == 0
    assert heal["registry_removed"] == 1
    assert heal["quarantined"] == 0  # no second intent row: bytes gone
    assert verify_archive(
        spark, cfg.archive_root, registry_path=cfg.registry_path
    ).count() == 0


def test_takedown_gate_index_leg(spark, tmp_path):
    # a tiny batch-partitioned media-gate index: the composed op must
    # route the same names through remove_from_index
    idx = str(tmp_path / "media_idx")
    df = spark.createDataFrame(
        [("a.png", 1, 11), ("b.png", 2, 22), ("c.png", 3, 33)],
        "mid string, phash long, extra long",
    ).withColumn("batch", F.lit(0))
    df.write.partitionBy("batch").parquet(idx)

    out = takedown(
        spark, ["b.png"], gate_indexes=((idx, "mid"),),
    )
    assert out["gates"] == [{"index": idx, "removed_rows": 1}]
    left = spark.read.parquet(idx)
    assert {r["mid"] for r in left.collect()} == {"a.png", "c.png"}


def test_takedown_legacy_archive_layout(spark, tmp_path):
    """Pre-r10 archives are partitioned (filetype, nite) with no batch
    leg; takedown's partition discovery must adapt to the layout it
    finds (and to a fully unpartitioned registry-style dataset)."""
    import hashlib

    ok = hashlib.md5(b"x").hexdigest()
    arch = str(tmp_path / "legacy_arch")
    spark.createDataFrame(
        [
            ("a.fits", bytearray(b"x"), ok, 1, "raw", "20240101"),
            ("b.fits", bytearray(b"x"), ok, 1, "raw", "20240102"),
        ],
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(arch)
    reg = str(tmp_path / "legacy_reg")
    spark.createDataFrame(
        [("a.fits", ok), ("b.fits", ok)], "filename string, md5sum string"
    ).write.parquet(reg)

    out = takedown(
        spark, ["a.fits"], archive_root=arch, registry_path=reg,
    )
    assert out["archive_removed"] == 1 and out["registry_removed"] == 1
    left = spark.read.parquet(arch)
    assert {r["filename"] for r in left.collect()} == {"b.fits"}
    assert verify_archive(spark, arch, registry_path=reg).count() == 0


def test_takedown_cli(spark, area, capsys):  # noqa: F811
    import json

    from dbbspark.cli import main

    cfg = _cfg(area)
    ingest_batch(spark, cfg)
    rc = main([
        "takedown",
        "--names", "manifest_SN_X1.json",
        "--archive", cfg.archive_root,
        "--registry", cfg.registry_path,
        "--quarantine", cfg.quarantine_path,
        "--reason", "retention",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["archive_removed"] == 1 and out["registry_removed"] == 1
    assert _archive_names(spark, cfg) == {"DECam_00000001.fits"}


def test_takedown_registry_leg_rewrites_only_matched_nites(spark, tmp_path):
    """VERDICT r10 item 2: the registry leg must be partition-pruned like
    the archive leg — only nite partitions holding matches are rewritten.
    Pinned structurally: an untouched nite partition keeps its exact
    parquet files (a rewrite would produce fresh file names)."""
    import glob

    reg = str(tmp_path / "registry")
    rows = [(f"f{n}_{i}.fits", f"n{n:04d}") for n in range(5) for i in range(4)]
    spark.createDataFrame(rows, "filename string, nite string").write.partitionBy(
        "nite"
    ).parquet(reg)
    untouched_before = sorted(glob.glob(os.path.join(reg, "nite=n0003", "*")))

    out = takedown(spark, ["f0_0.fits", "f1_0.fits"], registry_path=reg)
    assert out["registry_removed"] == 2
    got = {r["filename"] for r in spark.read.parquet(reg).collect()}
    assert got == {r[0] for r in rows} - {"f0_0.fits", "f1_0.fits"}
    assert sorted(glob.glob(os.path.join(reg, "nite=n0003", "*"))) == (
        untouched_before
    ), "unmatched nite partition was rewritten"


def test_takedown_registry_legacy_unpartitioned_fallback(spark, tmp_path):
    """A pre-r11 registry (data files at the root, nite a plain column)
    still works: the filesystem layout probe finds no partition levels
    and the leg falls back to the whole-root swap."""
    reg = str(tmp_path / "reg_legacy")
    spark.createDataFrame(
        [(f"f{i}.fits", "n0001") for i in range(6)],
        "filename string, nite string",
    ).write.parquet(reg)
    out = takedown(spark, ["f0.fits"], registry_path=reg)
    assert out["registry_removed"] == 1
    assert spark.read.parquet(reg).count() == 5
    # removing the rest leaves an empty but READABLE relation (legacy
    # whole-root semantics preserved)
    out2 = takedown(spark, [f"f{i}.fits" for i in range(1, 6)], registry_path=reg)
    assert out2["registry_removed"] == 5
    assert spark.read.parquet(reg).count() == 0


def test_takedown_escaped_and_null_partition_values(spark, tmp_path):
    """ADVICE r10 (low): partition values containing Spark-escaped
    characters (':' percent-encodes in dir names) and NULL values
    (__HIVE_DEFAULT_PARTITION__) must rebuild into the dir Spark
    actually wrote — the raw f-string form threw mid-takedown AFTER the
    quarantine intent row was written."""
    import hashlib

    arch = str(tmp_path / "arch")
    ok = hashlib.md5(b"x").hexdigest()
    rows = [
        ("a.fits", bytearray(b"x"), ok, 1, "raw", "20:26#a"),
        ("b.fits", bytearray(b"x"), ok, 1, "raw", "20:26#a"),
        ("c.fits", bytearray(b"x"), ok, 1, None, "plain"),
        ("d.fits", bytearray(b"x"), ok, 1, None, "plain"),
        # DEL (\x7f) is percent-encoded by escapePathName too (ADVICE
        # r11 low): the rebuilt path must name the dir Spark wrote
        ("e.fits", bytearray(b"x"), ok, 1, "raw", "20\x7f26"),
        ("f.fits", bytearray(b"x"), ok, 1, "raw", "20\x7f26"),
    ]
    spark.createDataFrame(
        rows,
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(arch)

    out = takedown(spark, ["a.fits", "c.fits", "e.fits"], archive_root=arch)
    assert out["archive_removed"] == 3
    left = spark.read.parquet(arch)
    assert {r["filename"] for r in left.collect()} == {
        "b.fits", "d.fits", "f.fits",
    }
    # siblings kept their partition values through the rewrite
    vals = {(r["filename"], r["filetype"], r["nite"]) for r in left.collect()}
    assert ("b.fits", "raw", "20:26#a") in vals
    assert ("d.fits", None, "plain") in vals
    assert ("f.fits", "raw", "20\x7f26") in vals

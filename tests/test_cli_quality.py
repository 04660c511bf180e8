"""CLI-level coverage for the round-4 quality surfaces: curate --funnel,
profile --checks/--baseline, overlap (dbbspark/cli.py)."""

from __future__ import annotations

import json

from dbbspark import cli


def test_profile_checks_gate_and_baseline(spark, tmp_path, capsys):
    src = str(tmp_path / "t")
    spark.range(100).selectExpr(
        "id", "cast(id % 7 as string) AS bucket"
    ).write.parquet(src)

    checks_ok = tmp_path / "ok.json"
    checks_ok.write_text(
        json.dumps(
            [
                {"check": "not_null", "column": "id"},
                {"check": "unique", "column": "id"},
                {"check": "row_count_between", "min": 100, "max": 100},
            ]
        )
    )
    prof_path = str(tmp_path / "prof.json")
    rc = cli.main(
        ["profile", "--path", src, "--save", prof_path, "--checks", str(checks_ok)]
    )
    assert rc == 0
    saved = json.loads(open(prof_path).read())
    assert saved["n_rows"] == 100
    capsys.readouterr()

    checks_bad = tmp_path / "bad.json"
    checks_bad.write_text(
        json.dumps([{"check": "unique", "column": "bucket"}])
    )
    rc = cli.main(["profile", "--path", src, "--checks", str(checks_bad)])
    assert rc == 1
    out = capsys.readouterr().out
    verdicts = json.loads(out.strip().splitlines()[-1])["checks"]
    assert verdicts[0]["passed"] is False and verdicts[0]["observed"] == 93

    # baseline drift: same data against its own profile -> no findings
    rc = cli.main(["profile", "--path", src, "--baseline", prof_path])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["drift"] == []


def test_overlap_cli(spark, tmp_path, capsys):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.range(0, 300).selectExpr("cast(id as string) AS text").write.parquet(a)
    spark.range(200, 500).selectExpr("cast(id as string) AS text").write.parquet(b)
    assert cli.main(["overlap", "--a", a, "--b", b, "--key-col", "text"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 100 shared of 500 union; unsaturated sketches -> exact
    assert out["jaccard"] == 100 / 500
    assert out["card_union"] == 500.0


def test_curate_funnel_waterfall_consistency(sf_dir, tmp_path, capsys):
    rc = cli.main(
        [
            "curate",
            "--sf-dir",
            sf_dir,
            "--out",
            str(tmp_path / "c"),
            "--funnel",
        ]
    )
    assert rc == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    funnel = next(
        json.loads(line)["funnel"]
        for line in out_lines
        if line.startswith('{"funnel"')
    )
    curated = next(
        int(line.split("curated=")[1].split(" ")[0])
        for line in out_lines
        if line.startswith("curated=")
    )
    # waterfall must chain: reached_{i+1} == survived_after_i, and the
    # final survivors equal the written corpus
    for prev, nxt in zip(funnel, funnel[1:]):
        assert nxt["reached"] == prev["survived_after"]
        assert prev["dropped"] + prev["survived_after"] == prev["reached"]
    assert funnel[-1]["survived_after"] == curated


def test_curate_purity_floor_keeps_dissimilar_members(sf_dir, tmp_path, capsys):
    """--purity-floor 0.99 demands near-identity before deleting: fewer
    (or equal) docs dropped than the unchecked transitive clustering."""
    rc = cli.main(
        ["curate", "--sf-dir", sf_dir, "--out", str(tmp_path / "a")]
    )
    assert rc == 0
    base = int(
        next(
            line.split("curated=")[1].split(" ")[0]
            for line in capsys.readouterr().out.splitlines()
            if line.startswith("curated=")
        )
    )
    rc = cli.main(
        [
            "curate", "--sf-dir", sf_dir, "--out", str(tmp_path / "b"),
            "--purity-floor", "0.99",
        ]
    )
    assert rc == 0
    strict = int(
        next(
            line.split("curated=")[1].split(" ")[0]
            for line in capsys.readouterr().out.splitlines()
            if line.startswith("curated=")
        )
    )
    assert strict >= base


def test_curate_keep_scripts_filters_dominant_script(sf_dir, tmp_path, capsys):
    """--keep-scripts latin keeps the (Latin-text) fixture corpus; a
    script nothing is written in empties it."""
    rc = cli.main(
        ["curate", "--sf-dir", sf_dir, "--out", str(tmp_path / "l"),
         "--keep-scripts", "latin"]
    )
    assert rc == 0
    latin = int(
        next(
            line.split("curated=")[1].split(" ")[0]
            for line in capsys.readouterr().out.splitlines()
            if line.startswith("curated=")
        )
    )
    assert latin > 0
    rc = cli.main(
        ["curate", "--sf-dir", sf_dir, "--out", str(tmp_path / "h"),
         "--keep-scripts", "hangul"]
    )
    assert rc == 0
    hangul = int(
        next(
            line.split("curated=")[1].split(" ")[0]
            for line in capsys.readouterr().out.splitlines()
            if line.startswith("curated=")
        )
    )
    assert hangul == 0


def test_curate_funnel_attributes_script_drops(sf_dir, tmp_path, capsys):
    """Regression (ADVICE r4): with --keep-scripts AND --funnel together,
    docs dropped by the script filter must appear as a 'script' funnel
    stage — not be silently counted as survivors."""
    rc = cli.main(
        ["curate", "--sf-dir", sf_dir, "--out", str(tmp_path / "s"),
         "--keep-scripts", "hangul", "--funnel"]
    )
    assert rc == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    funnel = next(
        json.loads(line)["funnel"]
        for line in out_lines
        if line.startswith('{"funnel"')
    )
    curated = next(
        int(line.split("curated=")[1].split(" ")[0])
        for line in out_lines
        if line.startswith("curated=")
    )
    stages = {row["stage"]: row for row in funnel}
    assert "script" in stages
    # the Latin fixture corpus has no hangul docs: everything surviving
    # the earlier stages is dropped by the script stage, and the
    # waterfall's final survivors equal the (empty) written corpus
    assert curated == 0
    assert stages["script"]["dropped"] == stages["script"]["reached"]
    assert funnel[-1]["survived_after"] == curated


def test_curate_repeats_and_curriculum(sf_dir, tmp_path, capsys):
    """--repeats materializes per-source epoch copies; --curriculum-stages
    writes a banded easy->hard ordering instead of the flat shuffle."""
    from dbbspark.session import get_spark

    rc = cli.main(
        ["curate", "--sf-dir", sf_dir, "--out", str(tmp_path / "r"),
         "--repeats", "*=2.0",
         "--curriculum-stages", "3"]
    )
    assert rc == 0
    base = int(
        next(
            line.split("curated=")[1].split(" ")[0]
            for line in capsys.readouterr().out.splitlines()
            if line.startswith("curated=")
        )
    )
    spark = get_spark("t")
    out = spark.read.parquet(str(tmp_path / "r"))
    rows = out.count()
    # x2.0 on every source: exactly two copies of each surviving doc
    assert rows == base and base % 2 == 0
    assert {r["rep"] for r in out.select("rep").distinct().collect()} == {0, 1}
    assert "stage" in out.columns and "order_key" in out.columns


def test_scrub_cli_exit_codes(spark, tmp_path, capsys):
    import hashlib

    ok = hashlib.md5(b"x").hexdigest()
    spark.createDataFrame(
        [("a.fits", bytearray(b"x"), ok, 1, "raw", "20240101"),
         ("b.fits", bytearray(b"y"), ok, 1, "raw", "20240101")],
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(str(tmp_path / "arch"))

    rc = cli.main(["scrub", "--archive", str(tmp_path / "arch")])
    assert rc == 1  # b.fits is rotten
    out = capsys.readouterr().out
    assert "content_md5_mismatch" in out and "b.fits" in out

    spark.createDataFrame(
        [("a.fits", bytearray(b"x"), ok, 1, "raw", "20240101")],
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(str(tmp_path / "clean"))
    assert cli.main(["scrub", "--archive", str(tmp_path / "clean")]) == 0


def test_nightly_ops_script_composes_monitor_scrub_profile(
    spark, sf_dir, tmp_path
):
    """VERDICT r5 item 8: examples/nightly_ops.sh is the cron loop the
    reference ran as two shell scripts, extended with scrub + drift
    profile. One clean run must exit 0, write the report pages and the
    profile baseline; the second run must take the --baseline branch and
    emit the drift page. (Each step is its own process with its own
    SparkSession — exactly the cron shape.)"""
    import hashlib
    import os
    import subprocess

    ok = hashlib.md5(b"x").hexdigest()
    arch = str(tmp_path / "arch")
    spark.createDataFrame(
        [("a.fits", bytearray(b"x"), ok, 1, "raw", "20240101")],
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(arch)
    reg = str(tmp_path / "reg")
    spark.createDataFrame(
        [("a.fits", ok)], "filename string, md5sum string"
    ).write.parquet(reg)

    # a tiny stage-in area so the DRAIN leg runs too (reference:
    # cron_save_DBB_stagein_to_DBB.sh) — one good FITS-ish delivery
    stage = tmp_path / "stagein"
    for d in ("notify", "delivery"):
        os.makedirs(stage / d, exist_ok=True)
    data = b"EXPNUM = 7\nOBSTYPE = object\npayload"
    (stage / "delivery" / "DECam_00000007.fits").write_bytes(data)
    (stage / "notify" / "DECam_00000007.fits.dbb").write_bytes(
        f"md5sum = {hashlib.md5(data).hexdigest()}\n".encode()
    )
    ingest_cfg = tmp_path / "ingest.cfg"
    ingest_archive = str(tmp_path / "ing_archive")
    ingest_cfg.write_text(
        f"""notify_dir = {stage / 'notify'}
delivery_dir = {stage / 'delivery'}
archive_root = {ingest_archive}
registry_path = {tmp_path / 'ing_registry'}
bad_file_dir = {tmp_path / 'ing_quarantine'}
checkpoint_dir = {tmp_path / 'ing_ckpt'}
"""
    )

    # a versioned-snapshot root for the retention-gc leg: three
    # committed versions (keep-last 2 must prune v0) and one staging
    # orphan YOUNGER than the 24 h horizon (must survive — a live
    # writer's staging is indistinguishable by age)
    from dbbspark.commit import commit_snapshot, committed_versions

    gc_root = str(tmp_path / "gate_index")
    for v in range(3):
        commit_snapshot(
            spark,
            gc_root,
            lambda p, v=v: spark.range(v + 1).write.parquet(p),
        )
    os.makedirs(gc_root + "/_staging/young")
    with open(gc_root + "/_staging/young/part", "w") as fh:
        fh.write("x")

    # a media drop for the C58 perceptual-gate leg: two distinct images.
    # MEDIA_DROP stays the same dir across both nightly runs, so night 2
    # re-submits night 1's files — all rejected against the persisted
    # hash index (the gate remembers ACCEPTED content, not directories).
    import numpy as np

    from dbbspark.sources.codecs import encode_pgm

    drop = tmp_path / "media_drop"
    drop.mkdir()
    y, x = np.mgrid[0:36, 0:36]
    for s in (1, 2):
        arr = np.clip(
            100 + 60 * np.sin(2 * np.pi * (s + 1) * x / 36)
            * np.cos(2 * np.pi * s * y / 36),
            0, 255,
        ).astype(np.uint8)
        (drop / f"m{s}.pgm").write_bytes(encode_pgm(arr))

    env = dict(
        os.environ,
        SF_DIR=sf_dir,
        REPORT_DIR=str(tmp_path / "report"),
        ARCHIVE=arch,
        REGISTRY=reg,
        STATE_DIR=str(tmp_path / "state"),
        PROFILE_PATH=reg,
        SCRUB_SAMPLE="1.0",
        SCRUB_SALT="7",
        INGEST_CONFIG=str(ingest_cfg),
        GC_ROOTS=gc_root,
        MEDIA_DROP=str(drop),
        MEDIA_INDEX=str(tmp_path / "media_idx"),
        MEDIA_OUT=str(tmp_path / "media_out"),
        MEDIA_KIND="pgm",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "examples", "nightly_ops.sh")

    r1 = subprocess.run(
        ["bash", script], env=env, cwd=repo, capture_output=True, text=True,
        timeout=420,
    )
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert os.path.exists(str(tmp_path / "state" / "profile.json"))
    assert os.path.exists(ingest_archive)  # the drain leg archived the file
    report_files = os.listdir(str(tmp_path / "report"))
    assert any(f.endswith(".html") for f in report_files), report_files
    assert "renamed_matches" in r1.stdout  # fuzzy pairing ran
    assert '"accepted": 2' in r1.stdout  # media gate: both images new
    # gc leg: v0 pruned, newest two kept, young staging untouched
    assert committed_versions(spark, gc_root) == [1, 2]
    assert os.path.exists(gc_root + "/_staging/young/part")

    # night 2 also drains a retention queue through the composed
    # takedown leg (audit-first; archive+registry)
    queue = tmp_path / "takedown_queue"
    queue.write_text("a.fits\n")
    env["TAKEDOWN_QUEUE"] = str(queue)
    env["QUARANTINE"] = str(tmp_path / "td_quarantine")

    r2 = subprocess.run(
        ["bash", script], env=env, cwd=repo, capture_output=True, text=True,
        timeout=420,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert '"drift"' in r2.stdout  # baseline branch taken
    assert os.path.exists(str(tmp_path / "report" / "drift.html"))
    # night 2 re-submitted night 1's drop: the persisted hash index
    # rejects every file, nothing new accepted
    assert '"accepted": 0' in r2.stdout
    assert spark.read.parquet(str(tmp_path / "media_out")).count() == 2
    # takedown leg: a.fits gone from archive AND registry, audit row
    # written, queue truncated for the next night
    assert '"archive_removed": 1' in r2.stdout
    # a.fits was the archive's ONLY file: its (filetype, nite) partition
    # is gone outright (an emptied partition is removed, not left as an
    # unreadable husk)
    assert not os.path.exists(
        os.path.join(arch, "filetype=raw", "nite=20240101")
    )
    assert spark.read.parquet(reg).where("filename = 'a.fits'").count() == 0
    q_rows = spark.read.parquet(str(tmp_path / "td_quarantine"))
    assert q_rows.where("orig_filename = 'a.fits'").count() == 1
    assert queue.read_text() == ""


def test_scrub_cli_bounded_driver_output(spark, tmp_path, capsys):
    """VERDICT r6 item 5: scrub on a FULLY-rotted archive (the command's
    reason to exist) must stay O(counts) on the driver — counts are
    aggregated Spark-side, stdout carries at most a 20-row sample, and
    --findings-out lands the complete detail in parquet."""
    import hashlib

    ok = hashlib.md5(b"x").hexdigest()
    rows = [
        (f"f{i}.fits", bytearray(b"ROT"), ok, 1, "raw", "20240101")
        for i in range(200)
    ]
    spark.createDataFrame(
        rows,
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(str(tmp_path / "rot"))

    sink = str(tmp_path / "findings")
    rc = cli.main(
        ["scrub", "--archive", str(tmp_path / "rot"), "--findings-out", sink]
    )
    assert rc == 1
    out_lines = capsys.readouterr().out.strip().splitlines()
    import json as _json

    head = _json.loads(out_lines[0])
    # every file is rotted twice over (md5 + size): counts see them all
    assert head["findings"] >= 200
    assert head["by_kind"].get("content_md5_mismatch") == 200
    # ... but the driver printed only the capped sample
    assert len(out_lines) <= 21
    # the full detail is in the sink
    assert spark.read.parquet(sink).count() == head["findings"]


def test_media_dedup_cli_stills(spark, tmp_path, capsys):
    """cli media-dedup (VERDICT r8 item 4): resized/re-encoded image
    copies are dropped on direct hash evidence; distinct images and
    undecodable files are kept."""
    import numpy as np

    from dbbspark.sources.codecs import encode_pgm, resize_netpbm

    src = tmp_path / "media"
    src.mkdir()
    y, x = np.mgrid[0:36, 0:36]
    for s in range(3):
        rng = np.random.default_rng(s)
        f = np.zeros((36, 36))
        for _ in range(2):
            fy, fx = rng.uniform(0.5, 2.5, 2)
            ph = rng.uniform(0, 2 * np.pi)
            f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(
                2 * np.pi * fy * y / 36
            )
        raw = encode_pgm(
            np.clip(100 + 30 * (2 + f), 0, 255).astype(np.uint8)
        )
        (src / f"img{s}.pgm").write_bytes(raw)
        if s == 0:  # one 2x resize + one byte copy of image 0
            (src / "img0_2x.pgm").write_bytes(resize_netpbm(raw, 72, 72))
            (src / "img0_copy.pgm").write_bytes(raw)
    (src / "broken.pgm").write_bytes(b"P5 garbage")
    out = str(tmp_path / "kept")
    rc = cli.main(
        ["media-dedup", "--src", str(src), "--kind", "pgm", "--out", out]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"files": 6, "kept": 4, "dropped": 2, "kind": "pgm"}
    kept = {r["path"].rsplit("/", 1)[-1] for r in spark.read.parquet(out).collect()}
    # min-path keep: img0.pgm < img0_2x.pgm < img0_copy.pgm
    assert kept == {"img0.pgm", "img1.pgm", "img2.pgm", "broken.pgm"}


def test_media_dedup_cli_clips(spark, tmp_path, capsys):
    """The pnmseq leg: a frame-dropped re-cut pairs with its original
    and is dropped; a disjoint clip is kept."""
    import numpy as np

    from dbbspark.sources.codecs import encode_pnm_seq

    src = tmp_path / "clips"
    src.mkdir()
    y, x = np.mgrid[0:48, 0:64]
    frames = []
    for t in range(24):
        f = 128 + 80 * np.sin(2 * np.pi * 2 * x / 64 + 0.12 * t) * np.cos(
            2 * np.pi * 1.5 * y / 48 - 0.08 * t
        )
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    (src / "a_base.pnms").write_bytes(encode_pnm_seq(frames))
    (src / "b_recut.pnms").write_bytes(
        encode_pnm_seq([f for i, f in enumerate(frames) if i % 3 != 2])
    )
    rng = np.random.default_rng(5)
    (src / "c_other.pnms").write_bytes(
        encode_pnm_seq(
            [rng.integers(0, 256, (48, 64)).astype(np.uint8) for _ in range(24)]
        )
    )
    rc = cli.main(["media-dedup", "--src", str(src), "--kind", "pnmseq"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary == {"files": 3, "kept": 2, "dropped": 1, "kind": "pnmseq"}


def test_media_dedup_cli_incremental(spark, tmp_path, capsys):
    """--index mode (C58, the cron shape): each invocation is one
    micro-batch through the streaming media gate — day 2's resized
    re-encode of a day-1 original is rejected against the PERSISTED
    index, not just within its own directory; explicit --batch-id
    re-run is an idempotent retry."""
    import numpy as np

    from dbbspark.sources.codecs import encode_pgm, resize_netpbm

    def img(seed):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:36, 0:36]
        f = np.zeros((36, 36))
        for _ in range(2):
            fy, fx = rng.uniform(0.5, 2.5, 2)
            ph = rng.uniform(0, 2 * np.pi)
            f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(
                2 * np.pi * fy * y / 36
            )
        return encode_pgm(np.clip(100 + 30 * (2 + f), 0, 255).astype(np.uint8))

    day1, day2 = tmp_path / "day1", tmp_path / "day2"
    day1.mkdir(); day2.mkdir()
    (day1 / "a.pgm").write_bytes(img(1))
    (day1 / "b.pgm").write_bytes(img(2))
    (day2 / "a_2x.pgm").write_bytes(resize_netpbm(img(1), 72, 72))
    (day2 / "c.pgm").write_bytes(img(3))
    idx, out = str(tmp_path / "idx"), str(tmp_path / "accepted")

    base = ["media-dedup", "--kind", "pgm", "--index", idx, "--out", out]
    assert cli.main(base + ["--src", str(day1)]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1 == {"files": 2, "accepted": 2, "rejected": 0, "batch": 0,
                  "kind": "pgm"}

    assert cli.main(base + ["--src", str(day2)]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2 == {"files": 2, "accepted": 1, "rejected": 1, "batch": 1,
                  "kind": "pgm"}
    names = {
        r["path"].rsplit("/", 1)[-1]
        for r in spark.read.parquet(out).collect()
    }
    assert names == {"a.pgm", "b.pgm", "c.pgm"}

    # retry of batch 1 (explicit --batch-id): identical state after
    assert cli.main(base + ["--src", str(day2), "--batch-id", "1"]) == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s3 == s2
    assert spark.read.parquet(out).count() == 3
    assert spark.read.parquet(idx).count() == 3


def test_media_dedup_incremental_refuses_index_lag(spark, tmp_path, capsys):
    """Files-first/index-last: a run that crashed between its two writes
    leaves the accepted sink ahead of the index. Auto batch-id must
    REFUSE (advancing would orphan that batch's hashes — its dups would
    be admitted forever); the pointed-at --batch-id retry heals, after
    which auto mode resumes."""
    import shutil

    import numpy as np
    import pytest

    from dbbspark.sources.codecs import encode_pgm

    def img(seed):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:36, 0:36]
        f = np.zeros((36, 36))
        for _ in range(2):
            fy, fx = rng.uniform(0.5, 2.5, 2)
            ph = rng.uniform(0, 2 * np.pi)
            f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(
                2 * np.pi * fy * y / 36
            )
        return encode_pgm(np.clip(100 + 30 * (2 + f), 0, 255).astype(np.uint8))

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.pgm").write_bytes(img(21))
    idx, out = str(tmp_path / "idx"), str(tmp_path / "acc")
    base = ["media-dedup", "--kind", "pgm", "--index", idx, "--out", out,
            "--src", str(drop)]
    assert cli.main(base) == 0
    capsys.readouterr()
    # simulate the crash: neither the index write nor the (later)
    # completion marker happened — both are after the accepted write
    shutil.rmtree(idx)
    shutil.rmtree(f"{idx}.batches")
    with pytest.raises(SystemExit, match="--batch-id 0"):
        cli.main(base)
    # the prescribed retry heals...
    assert cli.main(base + ["--batch-id", "0"]) == 0
    capsys.readouterr()
    # ...and auto mode resumes at the next batch
    assert cli.main(base) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["batch"] == 1 and s["accepted"] == 0  # same drop: all dups
    assert spark.read.parquet(idx).count() == 1


def test_media_dedup_cli_incremental_clips(spark, tmp_path, capsys):
    """--index with --kind pnmseq: day 2's frame-dropped re-cut of a
    day-1 accepted clip rejects against the persisted frame index."""
    import numpy as np

    from dbbspark.sources.codecs import encode_pnm_seq

    def clip(phase=0.0, drop=False, seed=None):
        h, w = 48, 64
        if seed is not None:
            rng = np.random.default_rng(seed)
            frames = [
                rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(24)
            ]
        else:
            y, x = np.mgrid[0:h, 0:w]
            frames = [
                np.clip(
                    128 + 80 * np.sin(2 * np.pi * 2 * x / w + 0.12 * t + phase)
                    * np.cos(2 * np.pi * 1.5 * y / h - 0.08 * t),
                    0, 255,
                ).astype(np.uint8)
                for t in range(24)
            ]
        if drop:
            frames = [f for i, f in enumerate(frames) if i % 3 != 2]
        return encode_pnm_seq(frames)

    day1, day2 = tmp_path / "d1", tmp_path / "d2"
    day1.mkdir(); day2.mkdir()
    (day1 / "a.pnms").write_bytes(clip())
    (day2 / "a_recut.pnms").write_bytes(clip(drop=True))
    (day2 / "b.pnms").write_bytes(clip(seed=5))
    idx, out = str(tmp_path / "idx"), str(tmp_path / "acc")
    base = ["media-dedup", "--kind", "pnmseq", "--index", idx, "--out", out]
    assert cli.main(base + ["--src", str(day1)]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (s1["accepted"], s1["batch"]) == (1, 0)
    assert cli.main(base + ["--src", str(day2)]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (s2["accepted"], s2["rejected"], s2["batch"]) == (1, 1, 1)
    names = {
        r["path"].rsplit("/", 1)[-1]
        for r in spark.read.parquet(out).collect()
    }
    assert names == {"a.pnms", "b.pnms"}


def test_media_dedup_auto_batch_id_zero_hash_batch(spark, tmp_path, capsys):
    """ADVICE r9: a batch whose accepted files were all undecodable
    indexes nothing by design — auto batch-id must NOT read that as a
    crash (the old detector refused forever, and the prescribed
    --batch-id retry indexed nothing again)."""
    import numpy as np

    from dbbspark.sources.codecs import encode_pgm

    day1, day2 = tmp_path / "junk_day", tmp_path / "real_day"
    day1.mkdir(); day2.mkdir()
    (day1 / "broken.pgm").write_bytes(b"P5 not really a pgm")
    rng = np.random.default_rng(3)
    (day2 / "a.pgm").write_bytes(
        encode_pgm(rng.integers(0, 256, (24, 24)).astype(np.uint8))
    )
    idx, out = str(tmp_path / "idx"), str(tmp_path / "acc")
    base = ["media-dedup", "--kind", "pgm", "--index", idx, "--out", out]
    assert cli.main(base + ["--src", str(day1)]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["batch"] == 0 and s1["accepted"] == 1  # accepted un-indexed
    # auto mode must advance to batch 1, not refuse
    assert cli.main(base + ["--src", str(day2)]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["batch"] == 1 and s2["accepted"] == 1


def test_index_remove_cli(spark, tmp_path, capsys):
    """cli index-remove: the takedown path end-to-end — remove an
    accepted file's hash, re-submit a re-encode, accepted."""
    import numpy as np

    from dbbspark.sources.codecs import encode_pgm, resize_netpbm
    from test_phash import _smooth_image

    day1, day2 = tmp_path / "d1", tmp_path / "d2"
    day1.mkdir(); day2.mkdir()
    (day1 / "a.pgm").write_bytes(encode_pgm(_smooth_image(41)))
    (day2 / "a2.pgm").write_bytes(
        resize_netpbm(encode_pgm(_smooth_image(41)), 72, 72)
    )
    idx, out = str(tmp_path / "idx"), str(tmp_path / "acc")
    base = ["media-dedup", "--kind", "pgm", "--index", idx, "--out", out]
    assert cli.main(base + ["--src", str(day1)]) == 0
    capsys.readouterr()
    removed_path = (
        spark.read.parquet(idx).select("mid").first()[0]
    )
    assert cli.main(
        ["index-remove", "--index", idx, "--ids", removed_path]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["removed_rows"] == 1
    assert cli.main(base + ["--src", str(day2)]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["accepted"] == 1  # re-encode judged fresh after removal


def test_parse_gate_spec_uri_forms():
    """DIR[:IDCOL] disambiguation (ADVICE r10 + r11): a ':'-tail is an
    id column only when it's an identifier — ports (with or without a
    path tail) and '://' authorities always stay part of the path."""
    from dbbspark.cli import _parse_gate_spec as p

    assert p("/data/idx") == ("/data/idx", "mid")
    assert p("/data/idx:doc_id") == ("/data/idx", "doc_id")
    assert p("hdfs://nn:8020/idx") == ("hdfs://nn:8020/idx", "mid")
    assert p("hdfs://nn:8020/idx:doc_id") == ("hdfs://nn:8020/idx", "doc_id")
    # port with no path tail: '8020' is all digits, never a column
    assert p("hdfs://nn:8020") == ("hdfs://nn:8020", "mid")
    assert p("s3a://bucket/idx") == ("s3a://bucket/idx", "mid")
    # a tail that merely CONTAINS digits is still a valid identifier
    assert p("/data/idx:col2") == ("/data/idx", "col2")
    assert p("/data/idx:_id") == ("/data/idx", "_id")

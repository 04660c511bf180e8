"""Small-file audit + compaction (maintenance.py): row multiset and
partition layout preserved, file count collapsed, original kept as a
backup until the caller deletes it."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dbbspark.maintenance import compact_partitioned, small_file_report


def _fragmented_dataset(spark, path):
    rows = [(i, f"ft{i % 2}", 20260000 + i % 3) for i in range(600)]
    df = spark.createDataFrame(rows, ["v", "filetype", "nite"])
    # 8 writers per partition -> ~8 small files in each of the 6 partitions
    df.repartition(8).write.partitionBy("filetype", "nite").parquet(path)
    return df


def test_report_counts_per_partition(spark, tmp_path):
    path = str(tmp_path / "arch")
    _fragmented_dataset(spark, path)
    rep = small_file_report(spark, path)
    assert len(rep) == 6  # 2 filetypes x 3 nites
    assert all(r.n_files >= 2 for r in rep)
    assert all(r.n_small == r.n_files for r in rep)  # all tiny here
    assert all("filetype=" in r.partition and "nite=" in r.partition for r in rep)


def test_compact_preserves_rows_and_collapses_files(spark, tmp_path):
    path = str(tmp_path / "arch")
    df = _fragmented_dataset(spark, path)
    before = sorted(
        map(tuple, spark.read.parquet(path).select("v", "filetype", "nite").collect())
    )
    n_before = len(glob.glob(path + "/*/*/*.parquet"))

    backup = compact_partitioned(spark, path, ["filetype", "nite"])

    after = sorted(
        map(tuple, spark.read.parquet(path).select("v", "filetype", "nite").collect())
    )
    assert after == before
    n_after = len(glob.glob(path + "/*/*/*.parquet"))
    assert n_after == 6  # one file per partition
    assert n_after < n_before
    # partition layout preserved (pruning still works)
    pruned = spark.read.parquet(path).where(F.col("filetype") == "ft0").count()
    assert pruned == df.where("filetype = 'ft0'").count()
    # original retained for verification
    assert len(glob.glob(backup + "/*/*/*.parquet")) == n_before


def test_compact_with_zorder_clustering(spark, tmp_path):
    """cluster_by Z-orders rows during the rewrite: same multiset, same
    partition layout, and every compacted file is tight on BOTH
    clustered columns (max one interleave cell wide per file here, since
    each partition collapses to a single sorted file)."""
    import random

    rng = random.Random(5)
    path = str(tmp_path / "clustered")
    rows = [
        ("ft%d" % (i % 2), rng.randint(0, 10**6), rng.randint(0, 10**6))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "filetype string, x long, y long")
    df.repartition(8).write.partitionBy("filetype").parquet(path)

    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    compact_partitioned(
        spark, path, ["filetype"], max_records_per_file=500,
        cluster_by=["x", "y"],
    )
    after_df = spark.read.parquet(path)
    assert sorted(map(tuple, after_df.collect())) == before
    assert "__zorder" not in after_df.columns

    from dbbspark.operators.layout import file_spans

    spans = file_spans(spark, path, ["x", "y"]).collect()
    assert len(spans) >= 4  # maxRecordsPerFile forced a split
    # clustered files are hyper-rectangles: average per-file span on
    # each dim well below the full range (an unclustered write leaves
    # every file spanning ~the full 10^6)
    for c in ("x", "y"):
        avg_span = sum(r[f"max_{c}"] - r[f"min_{c}"] for r in spans) / len(spans)
        assert avg_span < 700_000, f"{c} files not clustered: {avg_span}"


def test_cli_curate_end_to_end(spark, sf_dir, tmp_path):
    """The curate subcommand: output is deduped, shuffled, non-empty,
    and deterministic for a fixed seed."""
    from dbbspark.cli import main

    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    assert main(["curate", "--sf-dir", sf_dir, "--out", out1, "--seed", "3"]) == 0
    assert main(["curate", "--sf-dir", sf_dir, "--out", out2, "--seed", "3"]) == 0
    a = spark.read.parquet(out1)
    b = spark.read.parquet(out2)
    ra = [r["doc_id"] for r in a.collect()]
    assert len(ra) > 0
    assert len(set(ra)) == len(ra)  # no duplicate ids survive
    assert ra == [r["doc_id"] for r in b.collect()]  # seed-deterministic


def test_cli_compact_gate_index(spark, tmp_path):
    """The compact subcommand over streaming-gate state: audit lists the
    per-batch partitions, the rewrite collapses them into batch=-1 with
    identical rows, and the verified backup is droppable."""
    import glob

    from dbbspark.cli import main
    from dbbspark.streaming.neardedup import process_batch

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark shuffles partitions across executors during wide transformations",
        "completely different text about parquet column pruning and codegen",
    ]
    for i, t in enumerate(texts):
        process_batch(
            spark.createDataFrame([(i + 1, t)], ["doc_id", "text"]), i, idx, acc
        )
    before = sorted(
        map(tuple, spark.read.parquet(idx).select("doc", "perm", "minhash").collect())
    )
    assert main([
        "compact", "--path", idx, "--gate-index",
        "--small-bytes", "1048576", "--drop-backup",
    ]) == 0
    after = sorted(
        map(tuple, spark.read.parquet(idx).select("doc", "perm", "minhash").collect())
    )
    assert after == before
    assert glob.glob(f"{idx}/batch=-1/*.parquet")
    assert not glob.glob(f"{idx}.pre-compact")


def test_compact_refuses_snapshot_versioned_layout(spark, tmp_path):
    """compact_gate_index must refuse a v=<N> latest-wins index: a
    batch=-1 rewrite would union every snapshot and corrupt the counts
    (found driving examples/rolling_corpus.py against the line index)."""
    import pytest as _pytest

    from dbbspark.maintenance import compact_gate_index

    idx = str(tmp_path / "vidx")
    for v in (0, 1):
        spark.range(5).selectExpr("id AS h", "id AS df").write.parquet(
            f"{idx}/v={v}"
        )
    with _pytest.raises(ValueError, match="snapshot layout"):
        compact_gate_index(spark, idx)


def test_verify_archive_findings_and_clean(spark, tmp_path):
    """C54 integrity scrub: planted bit-rot, size drift, registry
    disagreement, and presence drift each produce exactly one finding;
    a consistent archive/registry pair produces none."""
    import hashlib

    from pyspark.sql import functions as F

    from dbbspark.maintenance import verify_archive

    def md5(b):
        return hashlib.md5(b).hexdigest()

    rows = [
        # (filename, content, stored_md5, stored_size)  — all consistent
        ("ok.fits", b"payload-ok", md5(b"payload-ok"), 10),
        # bit rot: stored checksum is of the ORIGINAL bytes
        ("rot.fits", b"payload-XX", md5(b"payload-ok"), 10),
        # size drift only (md5 stored for current content)
        ("short.fits", b"abc", md5(b"abc"), 99),
        # consistent here, but the registry disagrees on md5
        ("regbad.fits", b"zz", md5(b"zz"), 2),
        # consistent, but never registered
        ("unreg.fits", b"qq", md5(b"qq"), 2),
    ]
    arch = spark.createDataFrame(
        [(f, bytearray(c), m, s, "raw", "20240101") for f, c, m, s in rows],
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    )
    arch.write.partitionBy("filetype", "nite").parquet(str(tmp_path / "a"))
    reg = spark.createDataFrame(
        [
            ("ok.fits", md5(b"payload-ok")),
            ("rot.fits", md5(b"payload-ok")),
            ("short.fits", md5(b"abc")),
            ("regbad.fits", md5(b"DIFFERENT")),
            ("lost.fits", md5(b"gone")),  # registered, not archived
        ],
        "filename string, md5sum string",
    )
    reg.write.parquet(str(tmp_path / "r"))

    got = {
        (r["finding"], r["filename"])
        for r in verify_archive(
            spark, str(tmp_path / "a"), str(tmp_path / "r")
        ).collect()
    }
    assert got == {
        ("content_md5_mismatch", "rot.fits"),
        ("size_mismatch", "short.fits"),
        ("registry_md5_mismatch", "regbad.fits"),
        ("missing_in_registry", "unreg.fits"),
        ("missing_in_archive", "lost.fits"),
    }

    # clean pair → no findings
    clean = arch.where(F.col("filename") == "ok.fits")
    clean.write.partitionBy("filetype", "nite").parquet(str(tmp_path / "ca"))
    reg.where("filename = 'ok.fits'").write.parquet(str(tmp_path / "cr"))
    assert (
        verify_archive(spark, str(tmp_path / "ca"), str(tmp_path / "cr")).count()
        == 0
    )


def test_verify_archive_rotating_sample(spark, tmp_path):
    """Sampled scrubs are deterministic per salt and cover different
    slices across salts; presence drift still checks the full name set."""
    import hashlib

    from dbbspark.maintenance import verify_archive

    rows = [
        (f"f{i:03d}", bytes([i]), hashlib.md5(bytes([i])).hexdigest(), 1,
         "raw", "20240101")
        for i in range(200)
    ]
    spark.createDataFrame(
        [(f, bytearray(c), m, s, t, n) for f, c, m, s, t, n in rows],
        "filename string, content binary, md5sum string, filesize long, "
        "filetype string, nite string",
    ).write.partitionBy("filetype", "nite").parquet(str(tmp_path / "a"))

    a = verify_archive(spark, str(tmp_path / "a"), sample_fraction=0.3)
    b = verify_archive(spark, str(tmp_path / "a"), sample_fraction=0.3)
    assert a.count() == 0 and b.count() == 0  # clean either way
    # determinism + rotation are visible through the sampled row sets
    from dbbspark.operators.dedup import md5_int_col
    from pyspark.sql import functions as F

    def sampled_names(salt):
        arch = spark.read.parquet(str(tmp_path / "a"))
        gate = md5_int_col(
            F.concat_ws("\x1f", F.col("filename"), F.lit(str(salt)))
        ) % 1_000_000
        return {r["filename"] for r in arch.where(gate < 300_000).collect()}

    s0, s1 = sampled_names(0), sampled_names(1)
    assert s0 and s1 and s0 != s1

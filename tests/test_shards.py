"""WebDataset-style tar shard export (operators/shards.py, C36):
deterministic size-bounded assignment, loader-readable archives,
byte-identical re-export, real-file save."""

from __future__ import annotations

import io
import json
import tarfile

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.shards import (
    assign_shards,
    build_tar_shards,
    save_tar_files,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, bytes([i % 251]) * (100 + (i * 37) % 400), f"lang{i % 3}")
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, content binary, lang string"
    ).cache()


def test_assignment_matches_serial_scan(docs):
    """The distributed prefix-sum shard ids must equal the trivial
    single-pass assignment."""
    got = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs, 2000).collect()
    }
    rows = sorted(docs.select("doc_id", F.length("content").alias("n")).collect())
    off, want = 0, {}
    for r in rows:
        want[r["doc_id"]] = off // 2000
        off += r["n"]
    assert got == want


def test_assignment_bucket_invariant(docs):
    a = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 2000, num_buckets=3).collect()}
    b = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 2000, num_buckets=16).collect()}
    assert a == b


def test_tar_members_roundtrip(docs):
    shards = build_tar_shards(
        docs, shard_bytes=2000, meta_cols=["lang"]
    ).collect()
    seen = {}
    for s in shards:
        with tarfile.open(fileobj=io.BytesIO(bytes(s["tar"]))) as tf:
            names = tf.getnames()
            payloads = [n for n in names if n.endswith(".bin")]
            metas = [n for n in names if n.endswith(".json")]
            assert len(payloads) == len(metas) == s["n_docs"]
            for p in payloads:
                ident = int(p[: -len(".bin")])
                seen[ident] = tf.extractfile(p).read()
                meta = json.loads(tf.extractfile(f"{ident}.json").read())
                assert meta == {"lang": f"lang{ident % 3}"}
    want = {r["doc_id"]: bytes(r["content"]) for r in docs.collect()}
    assert seen == want


def test_export_is_byte_deterministic(docs):
    one = {r["shard"]: bytes(r["tar"]) for r in build_tar_shards(docs, 2000).collect()}
    two = {
        r["shard"]: bytes(r["tar"])
        for r in build_tar_shards(docs.repartition(5), 2000).collect()
    }
    assert one == two


def test_oversized_doc_gets_own_shard(spark):
    docs = spark.createDataFrame(
        [(1, b"a" * 50), (2, b"b" * 5000), (3, b"c" * 50)],
        "doc_id long, content binary",
    )
    got = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 1000).collect()}
    assert got[1] == 0
    assert got[2] == 0  # starts inside shard 0's budget window
    assert got[3] == 5  # resumes past the oversized doc's bytes


def test_save_tar_files(docs, tmp_path):
    shards = build_tar_shards(docs, shard_bytes=4000)
    names = save_tar_files(shards, str(tmp_path / "wds"))
    assert names and names == sorted(names)
    for n in names:
        with tarfile.open(str(tmp_path / "wds" / n)) as tf:
            assert tf.getnames()


def test_shard_bytes_validation(docs):
    with pytest.raises(ValueError):
        assign_shards(docs, 0)

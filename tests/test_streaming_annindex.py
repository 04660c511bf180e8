"""Streaming ANN-index gate (streaming/annindex.py, C39): cross-batch
semantic rejection over the persisted IVFPQ index, within-batch greedy
keep-lowest, retry idempotence, stream ≡ batch caller."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.operators.pq import train_ivfpq
from dbbspark.streaming.annindex import (
    _index_codes,
    gate_batch,
    process_batch,
)


def _vec(seed, d=16):
    # deterministic unit-ish vectors; far apart for distinct seeds
    vals = [((seed * 31 + j * 7) % 13) - 6.0 for j in range(d)]
    return [v / 10.0 for v in vals]


@pytest.fixture(scope="module")
def setup(spark):
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(12)], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, _vec(100)), (1, _vec(200)), (2, _vec(300))],
        "vec_id long, embedding array<double>",
    )
    books = train_ivfpq(base, cents, m=4, k=8)
    return cents, books


def test_gate_rejects_cross_batch_and_within_batch_dups(spark, tmp_path, setup):
    cents, books = setup
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame(
        [(1, _vec(1)), (2, _vec(2))], "vec_id long, embedding array<double>"
    )
    process_batch(b1, 0, idx, acc, cents, books)
    got0 = sorted(
        r["vec_id"] for r in spark.read.parquet(acc).collect()
    )
    assert got0 == [1, 2]

    # batch 2: 10 duplicates vec 1 exactly (cross-batch reject), 12 and
    # 13 duplicate each other (within-batch: keep 12), 14 is new
    b2 = spark.createDataFrame(
        [(10, _vec(1)), (12, _vec(5)), (13, _vec(5)), (14, _vec(6))],
        "vec_id long, embedding array<double>",
    )
    process_batch(b2, 1, idx, acc, cents, books)
    got = sorted(r["vec_id"] for r in spark.read.parquet(acc).collect())
    assert got == [1, 2, 12, 14]
    # index rows mirror accepted vectors exactly
    idx_ids = sorted(
        r["vec_id"] for r in _index_codes(spark, idx).collect()
    )
    assert idx_ids == got


def test_retry_is_idempotent(spark, tmp_path, setup):
    cents, books = setup
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    b1 = spark.createDataFrame(
        [(1, _vec(1))], "vec_id long, embedding array<double>"
    )
    process_batch(b1, 0, idx, acc, cents, books)
    b2 = spark.createDataFrame(
        [(2, _vec(1)), (3, _vec(9))], "vec_id long, embedding array<double>"
    )
    process_batch(b2, 1, idx, acc, cents, books)
    once = sorted(r["vec_id"] for r in spark.read.parquet(acc).collect())
    assert once == [1, 3]  # 2 rejected against batch 0's vec 1
    process_batch(b2, 1, idx, acc, cents, books)  # crashed-attempt re-run
    assert sorted(r["vec_id"] for r in spark.read.parquet(acc).collect()) == once
    assert sorted(
        r["vec_id"] for r in _index_codes(spark, idx).collect()
    ) == once


def test_batch_caller_equals_streaming(spark, tmp_path, setup):
    import glob
    import os
    import shutil

    from dbbspark.streaming.annindex import streaming_ann_gate

    cents, books = setup
    src = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    rows = [(1, _vec(1)), (2, _vec(1)), (3, _vec(4))]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(stage)
    os.makedirs(src, exist_ok=True)
    shutil.move(
        glob.glob(f"{stage}/part-*.parquet")[0], os.path.join(src, "b1.parquet")
    )
    stream = spark.readStream.schema("vec_id long, embedding array<double>").parquet(src)
    q = streaming_ann_gate(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "acc"),
        str(tmp_path / "ck"),
        cents,
        books,
    )
    q.awaitTermination()
    streamed = sorted(
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "acc")).collect()
    )
    batch = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    empty = _index_codes(spark, str(tmp_path / "none"))
    acc, _codes = gate_batch(batch, empty, cents, books)
    direct = sorted(r["vec_id"] for r in acc.collect())
    assert streamed == direct == [1, 3]


def test_eps_validation(spark, setup):
    cents, books = setup
    batch = spark.createDataFrame(
        [(1, _vec(1))], "vec_id long, embedding array<double>"
    )
    empty = _index_codes(batch.sparkSession, "/nonexistent-annidx")
    with pytest.raises(ValueError):
        gate_batch(batch, empty, cents, books, eps=0.0)

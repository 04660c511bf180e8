"""Takedown / remove_from_index racing a LIVE gate batch (VERDICT r11
item 3 — the one C55 multi-writer interleaving previously unpinned).

The hazard: remove_from_index's partition swap is two renames; a gate
batch's index READ landing between rename-out and rename-in sees the
index WITHOUT a surviving partition and re-admits its near-duplicates —
an end state that is neither of the two serializations. Since r12 the
gate's whole read→write section holds the same ``commit.exclusive_lock``
on the index root that takedown / remove_from_index / compact_gate_index
hold, so the interleaving is impossible by construction (loser-aborts).

Two tests: a deterministic interleave (each side attempted while the
other's lock is held — both must abort through the SAME lock file), and
a threaded race (a gate stream admitting fresh items + rejecting planted
re-encodes WHILE removals rewrite the partitions those survivors live
in; end state must show zero duplicate admissions and all removals
applied)."""

from __future__ import annotations

import threading

import pytest

from dbbspark.commit import ConcurrentWriteError, exclusive_lock
from dbbspark.maintenance import remove_from_index, takedown
from dbbspark.sources.codecs import encode_pgm, resize_netpbm
from dbbspark.streaming.mediadedup import process_batch

from tests.test_phash import _smooth_image


def _img(seed: int) -> bytes:
    return encode_pgm(_smooth_image(seed))


def _resized(seed: int, size: int = 32) -> bytes:
    return resize_netpbm(encode_pgm(_smooth_image(seed)), size, size)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "path string, content binary")


def test_gate_batch_and_removal_mutually_exclude(spark, tmp_path):
    """Deterministic interleave: while either side holds the index
    lock, the other aborts with ConcurrentWriteError — both sides go
    through the SAME <index>.lock, so the torn-read interleaving the
    two-rename swap would otherwise expose cannot be scheduled."""
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    process_batch(
        _batch(spark, [("a.pgm", bytearray(_img(1)))]), 0, idx, acc
    )

    # removal attempted while a "gate batch" holds the lock
    with exclusive_lock(spark, idx, purpose="gate_batch=1"):
        with pytest.raises(ConcurrentWriteError):
            remove_from_index(spark, idx, ["a.pgm"], id_col="mid")
        with pytest.raises(ConcurrentWriteError):
            takedown(spark, ["a.pgm"], gate_indexes=((idx, "mid"),))

    # gate batch attempted while a "removal" holds the lock
    with exclusive_lock(spark, idx, purpose="remove_from_index"):
        with pytest.raises(ConcurrentWriteError):
            process_batch(
                _batch(spark, [("b.pgm", bytearray(_img(2)))]), 1, idx, acc
            )

    # both released: the gate proceeds normally afterwards
    process_batch(
        _batch(spark, [("b.pgm", bytearray(_img(2)))]), 1, idx, acc
    )
    got = {r["mid"] for r in spark.read.parquet(idx).collect()}
    assert got == {"a.pgm", "b.pgm"}


def test_text_and_ann_gates_share_the_maintenance_lock(spark, tmp_path):
    """The near-dedup (text LSH) and ANN gates carry the same batch=<id>
    index + swap-based removal as the media gate, so r12 gives them the
    same lock. Pin both directions of the mutual exclusion for each."""
    from dbbspark.operators.pq import train_ivfpq
    from dbbspark.streaming import annindex, neardedup

    # text LSH gate
    idx1 = str(tmp_path / "nidx")
    acc1 = str(tmp_path / "nacc")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    neardedup.process_batch(docs, 0, idx1, acc1)
    with exclusive_lock(spark, idx1, purpose="remove_from_index"):
        with pytest.raises(ConcurrentWriteError):
            neardedup.process_batch(docs, 1, idx1, acc1)
    with exclusive_lock(spark, idx1, purpose="gate_batch=9"):
        with pytest.raises(ConcurrentWriteError):
            remove_from_index(spark, idx1, [1], id_col="doc")

    # ANN gate
    def _vec(seed, d=16):
        return [(((seed * 31 + j * 7) % 13) - 6.0) / 10.0 for j in range(d)]

    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, _vec(100)), (1, _vec(200)), (2, _vec(300))],
        "vec_id long, embedding array<double>",
    )
    books = train_ivfpq(base, cents, m=4, k=8)
    idx2 = str(tmp_path / "aidx")
    acc2 = str(tmp_path / "aacc")
    b = spark.createDataFrame(
        [(1, _vec(1))], "vec_id long, embedding array<double>"
    )
    annindex.process_batch(b, 0, idx2, acc2, cents, books)
    with exclusive_lock(spark, idx2, purpose="remove_from_index"):
        with pytest.raises(ConcurrentWriteError):
            annindex.process_batch(b, 1, idx2, acc2, cents, books)
    with exclusive_lock(spark, idx2, purpose="gate_batch=9"):
        with pytest.raises(ConcurrentWriteError):
            remove_from_index(spark, idx2, [1], id_col="vec_id")


def test_threaded_race_no_torn_index_admissions(spark, tmp_path):
    """Threaded race: a gate admits fresh items and rejects planted
    re-encodes of batch-0 survivors WHILE a remover rewrites the very
    partitions those survivors live in. Both sides retry on
    ConcurrentWriteError (the documented loser-aborts contract). End
    state: every re-encode of a SURVIVOR was rejected (a torn read
    would have admitted one), every fresh item admitted, every removal
    target gone."""
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    # batch 0: survivors s0/s1 plus removal targets r0..r5, one shared
    # partition — every removal rewrites the partition the survivors
    # live in, maximizing swap windows under the survivors' feet
    rows0 = [(f"s{i}.pgm", bytearray(_img(100 + i))) for i in range(2)]
    rows0 += [(f"r{i}.pgm", bytearray(_img(200 + i))) for i in range(6)]
    process_batch(_batch(spark, rows0), 0, idx, acc)

    errors: list = []

    def retry(fn, attempts=600):
        import time

        for _ in range(attempts):
            try:
                return fn()
            except ConcurrentWriteError:
                time.sleep(0.05)  # holder runs multi-second Spark jobs
        raise AssertionError("starved: lock never acquired")

    def gate_side():
        try:
            for i in range(1, 9):
                dup_of = f"s{i % 2}"  # re-encode of a SURVIVOR
                rows = [
                    (f"dup{i}.pgm", bytearray(_resized(100 + (i % 2)))),
                    (f"fresh{i}.pgm", bytearray(_img(300 + i))),
                ]
                retry(lambda r=rows, b=i: process_batch(
                    _batch(spark, r), b, idx, acc
                ))
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def remove_side():
        try:
            for i in range(6):
                retry(lambda i=i: remove_from_index(
                    spark, idx, [f"r{i}.pgm"], id_col="mid"
                ))
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    t1 = threading.Thread(target=gate_side)
    t2 = threading.Thread(target=remove_side)
    t1.start(); t2.start()
    t1.join(); t2.join()
    assert not errors, errors

    index_ids = {r["mid"] for r in spark.read.parquet(idx).collect()}
    accepted = {r["path"] for r in spark.read.parquet(acc).collect()}
    # removals applied
    assert not any(m.startswith("r") for m in index_ids)
    # survivors intact through every rewrite
    assert {"s0.pgm", "s1.pgm"} <= index_ids
    # zero torn-read admissions: no re-encode of a survivor accepted
    assert not any(p.startswith("dup") for p in accepted)
    # every fresh item admitted exactly once
    assert {f"fresh{i}.pgm" for i in range(1, 9)} <= accepted

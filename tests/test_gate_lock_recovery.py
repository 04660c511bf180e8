"""Cross-process gate-lock stories (VERDICT r12 items 6 + 7).

The r12 round serialized gate batches against index maintenance under
``commit.exclusive_lock``, but pinned the race single-JVM only (threads
+ deterministic interleavings) and left one operational hole untested:
a driver killed -9 INSIDE a locked gate batch leaves the lock file, and
every later trigger aborts until an operator breaks the stale lock.
Two subprocess harnesses close both:

- ``test_stale_gate_lock_recovery``: a REAL separate driver process
  acquires the gate lock (through ``process_batch``'s own code path),
  is SIGKILLed while holding it, and the next trigger (a) aborts by
  default, (b) recovers with ``lock_break_stale_after`` — the r13 gate
  knob — and (c) ends in EXACTLY the state of an uninterrupted run.
- ``test_two_process_gate_vs_takedown_race``: one gate batch (bounded
  ``lock_wait`` retry) and one ``remove_from_index`` takedown race from
  TWO separate driver JVMs against the same index root; the end state
  must equal one of the two serializations — the create-CAS lock's
  cross-process claim, previously argued only by construction.

Both reuse the executor-chaos pattern (tests/test_executor_chaos.py):
subprocess drivers with their own Spark JVMs, deterministic media
fixtures, exact expected end states.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

_IMG_HELPERS = r"""
import numpy as np

from dbbspark.sources.codecs import encode_pgm, resize_netpbm


def _img(seed):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:36, 0:36]
    f = np.zeros((36, 36))
    for _ in range(2):
        fy, fx = rng.uniform(0.5, 2.5, 2)
        ph = rng.uniform(0, 2 * np.pi)
        f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(2 * np.pi * fy * y / 36)
    return encode_pgm(np.clip(100 + 30 * (2 + f), 0, 255).astype("uint8"))
"""

_SESSION = r"""
from pyspark.sql import SparkSession

from dbbspark.session import apply_runtime_confs

spark = (
    SparkSession.builder.master("local[2]")
    .appName({app!r})
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
apply_runtime_confs(spark)
spark.sparkContext.setLogLevel("ERROR")
"""

# Driver that acquires the gate lock via process_batch's own locked
# section, signals, and hangs until SIGKILLed — leaving the lock file
# exactly as a crashed production driver would.
_HANG_SCRIPT = r"""
import sys
import time

sys.path.insert(0, {repo!r})
{session}

import dbbspark.streaming.mediadedup as md


def _hang(*a, **k):
    with open({sentinel!r}, "w") as fh:
        fh.write("locked")
    while True:
        time.sleep(1)


md._process_batch_locked = _hang
b = spark.createDataFrame([("x", bytearray(b"dummy"))], "path string, content binary")
md.process_batch(b, 1, {idx!r}, {acc!r})
"""

# Racer 1: one gate micro-batch with bounded lock retry.
_GATE_SCRIPT = r"""
import os
import sys
import time

sys.path.insert(0, {repo!r})
{session}
{img}

from dbbspark.streaming.mediadedup import process_batch

b1 = spark.createDataFrame(
    [("a1", resize_netpbm(_img(1), 48, 48)), ("c1", _img(3))],
    "path string, content binary",
)
with open({ready!r}, "w") as fh:
    fh.write("up")
while not os.path.exists({barrier!r}):
    time.sleep(0.02)
process_batch(b1, 1, {idx!r}, {acc!r}, lock_wait=120.0)
print("GATE_DONE")
spark.stop()
"""

# Racer 2: takedown of a0's index rows, retrying through contention the
# way a re-scheduled maintenance job would.
_TAKEDOWN_SCRIPT = r"""
import os
import sys
import time

sys.path.insert(0, {repo!r})
{session}

from dbbspark.commit import ConcurrentWriteError
from dbbspark.maintenance import remove_from_index

with open({ready!r}, "w") as fh:
    fh.write("up")
while not os.path.exists({barrier!r}):
    time.sleep(0.02)
deadline = time.monotonic() + 120
while True:
    try:
        res = remove_from_index(spark, {idx!r}, ["a0"], id_col="mid")
        break
    except ConcurrentWriteError:
        if time.monotonic() > deadline:
            raise
        time.sleep(0.05)
print("TAKEDOWN_DONE " + str(res["removed_rows"]))
spark.stop()
"""


def _img_local(seed):
    import numpy as np

    from dbbspark.sources.codecs import encode_pgm

    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:36, 0:36]
    f = np.zeros((36, 36))
    for _ in range(2):
        fy, fx = rng.uniform(0.5, 2.5, 2)
        ph = rng.uniform(0, 2 * np.pi)
        f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(2 * np.pi * fy * y / 36)
    return encode_pgm(np.clip(100 + 30 * (2 + f), 0, 255).astype("uint8"))


def _stills(spark, *seed_names):
    from dbbspark.sources.codecs import resize_netpbm

    rows = []
    for name, seed, resized in seed_names:
        img = _img_local(seed)
        rows.append((name, resize_netpbm(img, 48, 48) if resized else img))
    return spark.createDataFrame(rows, "path string, content binary")


def _spawn(script, cwd):
    return subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=cwd,
        start_new_session=True,
    )


def _wait_for(path, proc, timeout=180):
    deadline = time.monotonic() + timeout
    while not os.path.exists(path):
        if proc.poll() is not None:
            out, err = proc.communicate()
            raise AssertionError(
                f"subprocess died before signalling rc={proc.returncode}\n"
                f"stdout tail: {out[-1500:]}\nstderr tail: {err[-2500:]}"
            )
        if time.monotonic() > deadline:
            raise AssertionError(f"timed out waiting for {path}")
        time.sleep(0.05)


def test_stale_gate_lock_recovery(spark, tmp_path):
    """Kill -9 a separate driver INSIDE a locked gate batch; pin that
    (a) the next trigger aborts on the leftover lock, (b)
    ``lock_break_stale_after`` recovers, (c) the recovered run's
    decisions equal an uninterrupted run's exactly."""
    from dbbspark.commit import ConcurrentWriteError
    from dbbspark.streaming.mediadedup import last_completed_batch, process_batch

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    sentinel = str(tmp_path / "locked.sentinel")

    # batch 0 through the shared session: the baseline index
    process_batch(_stills(spark, ("a0", 1, False), ("b0", 2, False)), 0, idx, acc)

    script = _HANG_SCRIPT.format(
        repo=repo,
        session=_SESSION.format(app="hang-driver"),
        sentinel=sentinel,
        idx=idx,
        acc=acc,
    )
    proc = _spawn(script, str(tmp_path))
    try:
        _wait_for(sentinel, proc)
        # the separate driver holds <idx>.lock NOW; kill its whole
        # process group (python driver + its Spark JVM) with -9 — the
        # context manager never runs, the lock file survives
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
    assert os.path.exists(f"{idx}.lock"), "kill raced the lock acquisition"

    b1 = _stills(spark, ("a1", 1, True), ("c1", 3, False))
    # (a) default loser-aborts: the stale lock blocks every trigger
    with pytest.raises(ConcurrentWriteError):
        process_batch(b1, 1, idx, acc)
    # (b) explicit operator recovery: break locks older than 1 s
    time.sleep(1.2)
    process_batch(b1, 1, idx, acc, lock_break_stale_after=1.0)
    assert not os.path.exists(f"{idx}.lock")
    b2 = _stills(spark, ("c2", 3, True), ("d2", 4, False))
    process_batch(b2, 2, idx, acc)

    # (c) decisions equal the uninterrupted run on a fresh root
    idx2, acc2 = str(tmp_path / "idx2"), str(tmp_path / "acc2")
    process_batch(_stills(spark, ("a0", 1, False), ("b0", 2, False)), 0, idx2, acc2)
    process_batch(_stills(spark, ("a1", 1, True), ("c1", 3, False)), 1, idx2, acc2)
    process_batch(_stills(spark, ("c2", 3, True), ("d2", 4, False)), 2, idx2, acc2)

    def state(i, a):
        accepted = sorted(r["path"] for r in spark.read.parquet(a).collect())
        mids = sorted(r["mid"] for r in spark.read.parquet(i).collect())
        return accepted, mids, last_completed_batch(spark, i)

    assert state(idx, acc) == state(idx2, acc2)
    # and concretely: dups a1/c2 rejected, fresh c1/d2 accepted
    assert state(idx, acc)[0] == ["a0", "b0", "c1", "d2"]


def test_two_process_gate_vs_takedown_race(spark, tmp_path):
    """One gate batch and one takedown from TWO separate driver JVMs
    against the same index root, released simultaneously; the end state
    must be one of the two serializations. Exercises the create-CAS
    lock cross-process (the single-JVM race pins can't) and the r13
    ``lock_wait`` bounded-retry mode under real contention."""
    from dbbspark.streaming.mediadedup import process_batch

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    barrier = str(tmp_path / "go")
    ready1, ready2 = str(tmp_path / "r1"), str(tmp_path / "r2")

    process_batch(_stills(spark, ("a0", 1, False), ("b0", 2, False)), 0, idx, acc)

    gate = _spawn(
        _GATE_SCRIPT.format(
            repo=repo,
            session=_SESSION.format(app="race-gate"),
            img=_IMG_HELPERS,
            ready=ready1,
            barrier=barrier,
            idx=idx,
            acc=acc,
        ),
        str(tmp_path),
    )
    takedown = _spawn(
        _TAKEDOWN_SCRIPT.format(
            repo=repo,
            session=_SESSION.format(app="race-takedown"),
            ready=ready2,
            barrier=barrier,
            idx=idx,
        ),
        str(tmp_path),
    )
    try:
        _wait_for(ready1, gate)
        _wait_for(ready2, takedown)
        with open(barrier, "w") as fh:
            fh.write("go")
        out1, err1 = gate.communicate(timeout=300)
        out2, err2 = takedown.communicate(timeout=300)
    finally:
        for p in (gate, takedown):
            if p.poll() is None:
                os.killpg(p.pid, signal.SIGKILL)
    assert gate.returncode == 0 and "GATE_DONE" in out1, (
        f"gate driver rc={gate.returncode}\nstdout: {out1[-1500:]}\n"
        f"stderr: {err1[-2500:]}"
    )
    assert takedown.returncode == 0 and "TAKEDOWN_DONE" in out2, (
        f"takedown driver rc={takedown.returncode}\nstdout: {out2[-1500:]}\n"
        f"stderr: {err2[-2500:]}"
    )

    accepted = sorted(r["path"] for r in spark.read.parquet(acc).collect())
    mids = sorted(r["mid"] for r in spark.read.parquet(idx).collect())
    # gate-then-takedown: a1 (re-encode of a0) rejected against the
    # still-indexed a0, then a0's rows removed.
    serialization_1 = (["a0", "b0", "c1"], ["b0", "c1"])
    # takedown-then-gate: a0's rows already gone, a1 judged fresh.
    serialization_2 = (["a0", "a1", "b0", "c1"], ["a1", "b0", "c1"])
    assert (accepted, mids) in (serialization_1, serialization_2), (
        f"end state is neither serialization: accepted={accepted} mids={mids}"
    )
    assert not os.path.exists(f"{idx}.lock")

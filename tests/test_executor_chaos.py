"""Executor-JVM SIGKILL chaos during a gate batch (VERDICT r10 item 7).

The r6 chaos leg covered the checkpoint seam; this kills a REAL executor
JVM under ``local-cluster[2,4,1024]`` in the exact window the
files-first/index-last ordering is designed around — after the accepted-
docs write committed, before the index write ran — and demonstrates the
recovery end to end rather than by construction: Spark reschedules the
index write's tasks onto the surviving executor (the worker respawns the
dead one), the batch completes, the completion marker lands, and a
follow-up batch makes the right accept/reject decisions against the
index.

Runs in a SUBPROCESS: a local-cluster session cannot coexist with the
suite's shared local[*] JVM gateway, and an isolated driver process also
proves the package zip shipping works on real multi-JVM executors. The
kill is driver-orchestrated (a patched DataFrameWriter.parquet fires
SIGKILL on one CoarseGrainedExecutorBackend after write #1 of the chaos
batch), so the fault lands deterministically between the two writes —
no sleep-based timing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_SCRIPT = r"""
import json
import os
import signal
import subprocess
import sys

sys.path.insert(0, {repo!r})

import numpy as np
from pyspark.sql import SparkSession

from dbbspark.session import apply_runtime_confs
from dbbspark.sources.codecs import encode_pgm, resize_netpbm

spark = (
    SparkSession.builder.master("local-cluster[2,4,1024]")
    .appName("chaos")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
apply_runtime_confs(spark)
spark.sparkContext.setLogLevel("ERROR")

from dbbspark.streaming.mediadedup import last_completed_batch, process_batch


def _img(seed):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:36, 0:36]
    f = np.zeros((36, 36))
    for _ in range(2):
        fy, fx = rng.uniform(0.5, 2.5, 2)
        ph = rng.uniform(0, 2 * np.pi)
        f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(2 * np.pi * fy * y / 36)
    return encode_pgm(np.clip(100 + 30 * (2 + f), 0, 255).astype("uint8"))


APP_ID = spark.sparkContext.applicationId


def executor_pids():
    # filter by THIS app's id: other Spark jobs on the machine may have
    # their own executor backends, and killing one of those would both
    # break them and miss our window
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and APP_ID in line:
            pids.append(int(line.split(None, 1)[0]))
    return pids


root = {root!r}
idx, acc = f"{{root}}/idx", f"{{root}}/acc"

# batch 0: two fresh stills — a clean baseline under the cluster
b0 = spark.createDataFrame(
    [("a0", _img(1)), ("b0", _img(2))], "path string, content binary"
)
process_batch(b0, 0, idx, acc)
before = sorted(executor_pids())
assert len(before) == 2, f"expected 2 executors, saw {{before}}"

# chaos batch 1: one fresh still + a resized re-encode of a0 (must
# reject). Patch DataFrameWriter.parquet so that AFTER the first write
# of this batch (the accepted-docs sink) commits, one executor JVM is
# SIGKILLed — the index write then starts against a cluster that just
# lost half its executors.
import pyspark.sql.readwriter as rw

orig_parquet = rw.DataFrameWriter.parquet
state = {{"writes": 0, "armed": False, "killed": None}}


def chaos_parquet(self, path, **kw):
    r = orig_parquet(self, path, **kw)
    state["writes"] += 1
    if state["armed"] and state["writes"] == 1:
        victim = executor_pids()[0]
        os.kill(victim, signal.SIGKILL)
        state["killed"] = victim
    return r


rw.DataFrameWriter.parquet = chaos_parquet
b1 = spark.createDataFrame(
    [("c1", _img(3)), ("a1", resize_netpbm(_img(1), 48, 48))],
    "path string, content binary",
)
state["armed"] = True
process_batch(b1, 1, idx, acc)
state["armed"] = False
rw.DataFrameWriter.parquet = orig_parquet
assert state["killed"] is not None, "kill never fired"

# recovery evidence: batch completed (marker advanced), state exact
accepted = sorted(r["path"] for r in spark.read.parquet(acc).collect())
index_mids = sorted(r["mid"] for r in spark.read.parquet(idx).collect())
marker = last_completed_batch(spark, idx)

# follow-up batch on the healed cluster: dup of c1 rejects, fresh d2
# accepts — the index write the kill raced is fully usable
b2 = spark.createDataFrame(
    [("c2", resize_netpbm(_img(3), 54, 54)), ("d2", _img(4))],
    "path string, content binary",
)
process_batch(b2, 2, idx, acc)
accepted2 = sorted(r["path"] for r in spark.read.parquet(acc).collect())
marker2 = last_completed_batch(spark, idx)

print("CHAOS_RESULT " + json.dumps({{
    "killed": state["killed"],
    "accepted_after_chaos": accepted,
    "index_after_chaos": index_mids,
    "marker_after_chaos": marker,
    "accepted_final": accepted2,
    "marker_final": marker2,
}}))
spark.stop()
"""


_CLIP_SCRIPT = r"""
import json
import os
import signal
import subprocess
import sys

sys.path.insert(0, {repo!r})

import numpy as np
from pyspark.sql import SparkSession

from dbbspark.session import apply_runtime_confs
from dbbspark.sources.codecs import encode_pnm_seq

spark = (
    SparkSession.builder.master("local-cluster[2,4,1024]")
    .appName("clip-chaos")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
apply_runtime_confs(spark)
spark.sparkContext.setLogLevel("ERROR")

from dbbspark.streaming.mediadedup import (
    last_completed_batch,
    process_clip_batch,
)


def _clip(n=24, phase=0.0, drop=None):
    h, w = 48, 64
    y, x = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        f = 128 + 80 * np.sin(
            2 * np.pi * 2.0 * x / w + 0.12 * t + phase
        ) * np.cos(2 * np.pi * 1.5 * y / h - 0.08 * t)
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    if drop:
        frames = [f for i, f in enumerate(frames) if i % 3 != 2]
    return encode_pnm_seq(frames)


def _black(n=24):
    return encode_pnm_seq([np.zeros((48, 64), dtype=np.uint8)] * n)


APP_ID = spark.sparkContext.applicationId


def executor_pids():
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and APP_ID in line:
            pids.append(int(line.split(None, 1)[0]))
    return pids


root = {root!r}
idx, acc = f"{{root}}/idx", f"{{root}}/acc"
MTV = 25.0  # the production degenerate-frame policy setting

# batch 0: one live clip + one ALL-BLACK clip — the degenerate-signature
# leg's corpus state (black0's frames index with degenerate fvar)
b0 = spark.createDataFrame(
    [("a0", _clip()), ("black0", _black())], "path string, content binary"
)
process_clip_batch(b0, 0, idx, acc, min_thumb_variance=MTV)
before = sorted(executor_pids())
assert len(before) == 2, f"expected 2 executors, saw {{before}}"

# chaos batch 1: fresh c1 (accept), a frame-dropped re-cut of a0
# (reject via the live-frame leg), and a SECOND all-black clip (reject
# via the degenerate-signature leg). SIGKILL one executor after the
# accepted-clips write commits, before the composite (clip, frame)
# index rows write.
import pyspark.sql.readwriter as rw

orig_parquet = rw.DataFrameWriter.parquet
state = {{"writes": 0, "armed": False, "killed": None}}


def chaos_parquet(self, path, **kw):
    r = orig_parquet(self, path, **kw)
    state["writes"] += 1
    if state["armed"] and state["writes"] == 1:
        victim = executor_pids()[0]
        os.kill(victim, signal.SIGKILL)
        state["killed"] = victim
    return r


rw.DataFrameWriter.parquet = chaos_parquet
b1 = spark.createDataFrame(
    [
        ("c1", _clip(phase=2.0)),
        ("a1", _clip(drop="1/3")),
        ("black1", _black(18)),
    ],
    "path string, content binary",
)
state["armed"] = True
process_clip_batch(b1, 1, idx, acc, min_thumb_variance=MTV)
state["armed"] = False
rw.DataFrameWriter.parquet = orig_parquet
assert state["killed"] is not None, "kill never fired"

accepted = sorted(r["path"] for r in spark.read.parquet(acc).collect())
index_rows = (
    spark.read.parquet(idx).groupBy("mid").count().collect()
)
index_counts = {{r["mid"]: r["count"] for r in index_rows}}
marker = last_completed_batch(spark, idx)

# follow-up on the healed cluster: the index rows the kill raced gate
# correctly — re-cut of c1 rejects, a third black clip rejects, fresh
# d2 accepts
b2 = spark.createDataFrame(
    [
        ("c2", _clip(phase=2.0, drop="1/3")),
        ("black2", _black(12)),
        ("d2", _clip(phase=4.0)),
    ],
    "path string, content binary",
)
process_clip_batch(b2, 2, idx, acc, min_thumb_variance=MTV)
accepted2 = sorted(r["path"] for r in spark.read.parquet(acc).collect())
marker2 = last_completed_batch(spark, idx)

print("CHAOS_RESULT " + json.dumps({{
    "killed": state["killed"],
    "accepted_after_chaos": accepted,
    "index_counts_after_chaos": index_counts,
    "marker_after_chaos": marker,
    "accepted_final": accepted2,
    "marker_final": marker2,
}}))
spark.stop()
"""


def test_clip_gate_survives_executor_sigkill_between_writes(tmp_path):
    """VERDICT r11 item 7: the stills chaos test covers the flat-media
    gate; the clip gate's degenerate-signature leg and composite
    (clip, frame) index rows are a different recovery surface — same
    kill window (after the accepted write, before the index write),
    exact expected accepted/index state demanded."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CLIP_SCRIPT.format(repo=repo, root=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
    )
    marker_lines = [
        line for line in proc.stdout.splitlines()
        if line.startswith("CHAOS_RESULT ")
    ]
    assert proc.returncode == 0 and marker_lines, (
        f"clip chaos driver failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
    res = json.loads(marker_lines[-1][len("CHAOS_RESULT "):])
    # chaos batch completed exactly: fresh c1 accepted; a0's re-cut
    # rejected via live frames; black1 rejected via the degenerate
    # signature; 8 composite frame rows per accepted decodable clip
    assert res["accepted_after_chaos"] == ["a0", "black0", "c1"]
    assert res["index_counts_after_chaos"] == {
        "a0": 8, "black0": 8, "c1": 8,
    }
    assert res["marker_after_chaos"] == 1
    # healed cluster keeps gating: re-cut + third black reject, d2 in
    assert res["accepted_final"] == ["a0", "black0", "c1", "d2"]
    assert res["marker_final"] == 2


def test_stills_gate_survives_executor_sigkill_between_writes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, root=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
    )
    marker_lines = [
        line for line in proc.stdout.splitlines()
        if line.startswith("CHAOS_RESULT ")
    ]
    assert proc.returncode == 0 and marker_lines, (
        f"chaos driver failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
    res = json.loads(marker_lines[-1][len("CHAOS_RESULT "):])
    # the chaos batch completed exactly: fresh c1 accepted, the resized
    # re-encode a1 rejected, index holds each accepted still once, and
    # the completion marker advanced past the batch the kill raced
    assert res["accepted_after_chaos"] == ["a0", "b0", "c1"]
    assert res["index_after_chaos"] == ["a0", "b0", "c1"]
    assert res["marker_after_chaos"] == 1
    # the healed cluster keeps gating correctly
    assert res["accepted_final"] == ["a0", "b0", "c1", "d2"]
    assert res["marker_final"] == 2

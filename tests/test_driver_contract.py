"""The external-driver contract: __spark_entry__ must work from a FRESH
process whose cwd is OUTSIDE the repo, with a driver-owned session in a
hostile timezone — exactly how the verify harness invokes it. The
Arrow-batched (mapInPandas) queries are the sensitive ones: their
closures import dbbspark on the WORKERS, which only resolves because
apply_runtime_confs ships the package zip (session._ship_package)."""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
# the two Python-worker queries + the flagship
n1 = qs["q_multimodal_decode"](spark, "/root/testdata/sf0.001").count()
n2 = qs["q_metadata_extract"](spark, "/root/testdata/sf0.001").count()
n3 = e.entry(spark).count()
assert n1 > 0 and n2 > 0 and n3 > 0, (n1, n2, n3)
print("CONTRACT_OK", n1, n2, n3)
"""


def test_entry_from_foreign_cwd_hostile_tz(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", PROBE.format(repo=REPO)],
        cwd=str(tmp_path),  # NOT the repo root
        capture_output=True,
        text=True,
        timeout=480,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "CONTRACT_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_bench_runs_and_emits_json(tmp_path):
    """The driver records bench.py's single JSON line each round — guard
    that it runs clean (rc=0) and parses, at the smallest fixture."""
    import json

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
             "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["unit"] == "sec" and d["value"] > 0
    assert len(d["queries"]) == 50

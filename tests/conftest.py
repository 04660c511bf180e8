from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DBBSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from dbbspark.session import apply_runtime_confs

    import tempfile

    s = (
        SparkSession.builder.master("local[4]")
        .appName("dbbspark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="dbbspark-wh-"))
        # one JVM hosts the whole 500+-test suite: localCheckpoint
        # blocks, broadcasts, and codegen compilation accumulate for
        # ~30 min — the default 1g driver heap OOM'd once (r7, a
        # block-manager cleanup thread died mid-suite). 4g + a tighter
        # ContextCleaner GC cadence keeps reclamation ahead of growth.
        .config("spark.driver.memory", "4g")
        .config("spark.cleaner.periodicGC.interval", "5min")
        .getOrCreate()
    )
    apply_runtime_confs(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from dbbspark.verify import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()

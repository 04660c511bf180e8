"""JDBC registry sink (jdbc_sink.py, S14): bulk MERGE upsert into an
embedded Derby registry — insert, update, batch-replay idempotence, and
the foreachBatch adapter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbbspark.jdbc_sink import jdbc_upsert, register_batch_jdbc

URL = "jdbc:derby:memory:dbbsink;create=true"


@pytest.fixture(scope="module")
def registry(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE registry (filename VARCHAR(64) NOT NULL PRIMARY KEY, "
        "status VARCHAR(16), size_bytes BIGINT)"
    )
    conn.commit()
    yield URL
    st.execute("DROP TABLE registry")
    conn.commit()
    conn.close()


def _read(spark):
    return {
        (r["FILENAME"], r["STATUS"], r["SIZE_BYTES"])
        for r in spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", "registry")
        .load()
        .collect()
    }


def test_insert_then_update_then_replay(spark, registry):
    b1 = spark.createDataFrame(
        [("a.fits", "ok", 100), ("b.fits", "ok", 200)],
        "filename string, status string, size_bytes long",
    )
    jdbc_upsert(b1, URL, "registry", ["filename"])
    assert _read(spark) == {("a.fits", "ok", 100), ("b.fits", "ok", 200)}

    # update one, insert one
    b2 = spark.createDataFrame(
        [("b.fits", "verified", 200), ("c.fits", "ok", 300)],
        "filename string, status string, size_bytes long",
    )
    jdbc_upsert(b2, URL, "registry", ["filename"])
    want = {
        ("a.fits", "ok", 100),
        ("b.fits", "verified", 200),
        ("c.fits", "ok", 300),
    }
    assert _read(spark) == want

    # at-least-once replay: same batch again -> identical table state
    jdbc_upsert(b2, URL, "registry", ["filename"])
    assert _read(spark) == want


def test_foreachbatch_adapter_idempotent(spark, registry):
    batch = spark.createDataFrame(
        [("d.fits", "ok", 400)], "filename string, status string, size_bytes long"
    )
    register_batch_jdbc(batch, 7, URL, "registry", ["filename"])
    register_batch_jdbc(batch, 7, URL, "registry", ["filename"])  # retry
    rows = _read(spark)
    assert ("d.fits", "ok", 400) in rows
    assert len([r for r in rows if r[0] == "d.fits"]) == 1


def test_key_validation(spark, registry):
    df = spark.createDataFrame([("x", "ok", 1)], "filename string, status string, size_bytes long")
    with pytest.raises(ValueError):
        jdbc_upsert(df, URL, "registry", ["nope"])
    with pytest.raises(ValueError):
        jdbc_upsert(df, URL, "registry", [])

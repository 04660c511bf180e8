"""Generic JDBC source (SURVEY.md §2.1 S5) against an embedded Derby
database — a real JDBC round trip, no external server: Spark bundles the
Derby driver for its Hive metastore, and `jdbc:derby:memory:` databases
live inside the same JVM local-mode executors run in.

The reference's relational reads are five SQL-string queries against a
production DB (bin/monitor_DBB_stagein.py:738-900); these tests cover the
same access shapes: whole table, query-shaped read, filter pushdown, and
the partitioned parallel scan that makes a JDBC read scale past one task.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dbbspark.tables import load_jdbc_table, load_table

URL = "jdbc:derby:memory:dbbtest;create=true"


@pytest.fixture(scope="module")
def derby(spark):
    """Create and seed an in-memory Derby DB through the driver JVM."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE transfers (file_id INT NOT NULL, filename VARCHAR(64), "
        "status VARCHAR(16), nite VARCHAR(8))"
    )
    ps = conn.prepareStatement("INSERT INTO transfers VALUES (?, ?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setString(2, f"DECam_{i:08d}.fits.fz")
        ps.setString(3, "ok" if i % 7 else "fail")
        ps.setString(4, f"2026{i % 2:02d}15")
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    yield URL


def test_jdbc_whole_table(spark, derby):
    df = load_jdbc_table(spark, derby, "transfers")
    assert df.count() == 100
    assert set(df.columns) == {"FILE_ID", "FILENAME", "STATUS", "NITE"}


def test_load_table_dispatches_on_jdbc_url(spark, derby):
    df = load_table(spark, derby, "transfers")
    assert df.count() == 100


def test_jdbc_filter_pushes_down(spark, derby):
    df = load_jdbc_table(spark, derby, "transfers").where(F.col("STATUS") == "fail")
    assert df.count() == 100 // 7 + 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "STATUS" in plan


def test_jdbc_query_shaped_read(spark, derby):
    q = "(SELECT nite, COUNT(*) AS cnt FROM transfers GROUP BY nite) t"
    rows = {r["NITE"]: r["CNT"] for r in load_jdbc_table(spark, derby, q).collect()}
    assert rows == {"20260015": 50, "20260115": 50}


def test_jdbc_partitioned_scan(spark, derby):
    df = load_jdbc_table(
        spark,
        derby,
        "transfers",
        partition_column="FILE_ID",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100  # bounds split the scan, never filter rows


def test_jdbc_partition_args_validated(spark, derby):
    with pytest.raises(ValueError, match="partition_column requires"):
        load_jdbc_table(spark, derby, "transfers", partition_column="FILE_ID")

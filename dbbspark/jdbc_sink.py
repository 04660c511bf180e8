"""JDBC registry sink with idempotent set-based upsert (SURVEY.md §2.1
S14 closure of S10/S5).

The reference registers every archived file in a production database
(`bin/save_DBB_stagein_to_DBB.py:159-164` inserts per file row-at-a-time
through its DB layer). The engine's own registry sink is parquet
(streaming/ingest.py S10); this module is the DATABASE-backed variant
for deployments where the registry must live in an RDBMS the rest of the
observatory queries — with the reference's per-row INSERT re-expressed
as a two-phase bulk upsert:

1. STAGE: the batch lands in a staging table via Spark's parallel JDBC
   writer — executors write concurrently, the driver moves no rows.
2. MERGE: one set-based ``MERGE INTO target USING stage ON keys`` issued
   driver-side over a plain java.sql connection (py4j; the driver JVM
   already carries the JDBC driver jar Spark used to stage). Matched
   rows update, unmatched insert — so re-running the same batch is a
   no-op, which is exactly the foreachBatch at-least-once contract the
   parquet sinks meet with dynamic-partition overwrite.

Scale notes: the wide data path (stage) is distributed and partitioned
like any Spark JDBC write (`numPartitions` on the writer); the MERGE is
one DDL-sized statement whose work happens inside the database engine —
nothing row-sized ever crosses py4j. Works against any MERGE-capable
JDBC database; tested against embedded Derby (same stance as the S5
source tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _connection(spark, url: str):
    return spark._jvm.java.sql.DriverManager.getConnection(url)


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    stage_table: str | None = None,
    num_partitions: int | None = None,
    string_type: str = "VARCHAR(1024)",
) -> int:
    """Upsert ``df`` into JDBC ``table`` on ``key_cols``; returns the
    number of rows staged. The target table must exist (its schema is
    the caller's contract with the database); the staging table is
    created/replaced by Spark and dropped afterwards.

    Idempotent by construction: MERGE matched→UPDATE, unmatched→INSERT,
    so replaying a batch converges to the same table state."""
    if not key_cols or not set(key_cols) <= set(df.columns):
        raise ValueError(f"key_cols {key_cols} must be a subset of {df.columns}")
    # Spark's JDBC writer quotes column identifiers in DataFrame case;
    # staging them UPPERCASE makes the quoted names equal to what the
    # MERGE's unquoted references fold to (Derby/Oracle/DB2 fold up —
    # the identifier-folding family this sink targets; quoted-lowercase
    # databases would key the whole statement the other way).
    df = df.toDF(*[c.upper() for c in df.columns])
    cols = df.columns
    key_cols = [k.upper() for k in key_cols]
    stage = stage_table or f"{table}_STAGE"
    spark = df.sparkSession
    writer = df.write.format("jdbc").option("url", url).option(
        "dbtable", stage
    ).mode("overwrite")
    # Spark's Derby dialect maps StringType to CLOB, which cannot be
    # compared against the target's VARCHAR keys; stage strings as
    # VARCHAR explicitly (registry values are name/status-sized).
    strings = [
        f.name for f in df.schema.fields if f.dataType.typeName() == "string"
    ]
    if strings:
        writer = writer.option(
            "createTableColumnTypes",
            ", ".join(f"{c} {string_type}" for c in strings),
        )
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    writer.save()

    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    non_keys = [c for c in cols if c not in key_cols]
    insert_cols = ", ".join(cols)
    insert_vals = ", ".join(f"s.{c}" for c in cols)
    clauses = []
    if non_keys:
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        clauses.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
    clauses.append(
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
    merge_sql = (
        f"MERGE INTO {table} t USING {stage} s ON ({on}) " + " ".join(clauses)
    )
    conn = _connection(spark, url)
    try:
        st = conn.createStatement()
        st.execute(merge_sql)
        conn.commit()
        st.execute(f"DROP TABLE {stage}")
        conn.commit()
    finally:
        conn.close()
    return df.count()


def register_batch_jdbc(
    batch: DataFrame,
    batch_id: int,
    url: str,
    table: str,
    key_cols: list[str],
) -> None:
    """foreachBatch adapter: upsert one micro-batch into the registry
    table. A retried batch_id re-merges the identical rows — table state
    is unchanged, the same idempotence the parquet registry gets from
    batch=<id> dynamic-partition overwrite. Per-batch staging table name
    so a retry never races a successor batch's stage."""
    jdbc_upsert(
        batch,
        url,
        table,
        key_cols,
        stage_table=f"{table}_STAGE_{int(batch_id)}",
    )

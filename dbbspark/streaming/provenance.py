"""Provenance: root-task creation + run-id stamping (SURVEY.md §2.1 S13).

The reference creates a root `task` row once and threads its `task_id`
through every file registration and bad-file insert
(`bin/create_task_save_DBB_stagein_to_DBB.py:33-43`; consumed at
`bin/save_DBB_stagein_to_DBB.py:160,280,345`). Spark-native form: an
append-only `task` dimension table (parquet) plus a `task_id` lit column
stamped on every row the ingest writes — every archived/registered/
quarantined row is traceable to the run that produced it.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, Row, SparkSession, functions as F


def create_task(
    spark: SparkSession,
    task_path: str,
    label: str,
    root_task_id: str | None = None,
) -> str:
    """Append a task row; return its task_id (a uuid — DB sequence in the
    reference). ``root_task_id`` links child runs to a root task the way
    `i_am_root=True` does in the reference."""
    task_id = uuid.uuid4().hex
    row = Row(
        task_id=task_id,
        label=label,
        root_task_id=root_task_id,
        i_am_root=root_task_id is None,
    )
    spark.createDataFrame(
        [row],
        "task_id string, label string, root_task_id string, i_am_root boolean",
    ).withColumn(
        "created_ts", F.current_timestamp()
    ).coalesce(1).write.mode("append").parquet(task_path)
    return task_id


def read_tasks(spark: SparkSession, task_path: str) -> DataFrame:
    """The task dimension table (empty DataFrame if no runs yet)."""
    if not os.path.exists(task_path):
        return spark.createDataFrame(
            [],
            "task_id string, label string, root_task_id string, "
            "i_am_root boolean, created_ts timestamp",
        )
    return spark.read.parquet(task_path)

"""Ingestion front-end: batch + Structured Streaming stage-in pipeline.

SURVEY.md §2.1 S1-S13 and §2.9 ST1-ST9, re-expressed set-at-a-time: the
reference's per-file loop (`bin/save_DBB_stagein_to_DBB.py:347-348`)
becomes one DataFrame pipeline executed per micro-batch.
"""

from .ingest import (
    IngestConfig,
    IngestResult,
    classify_pairs,
    ingest_batch,
    start_ingest_stream,
)
from .provenance import create_task, read_tasks
from .stateful import (
    dedup_within_watermark,
    run_to_memory,
    sequence_gap_monitor,
    stream_events,
    windowed_counts,
)

__all__ = [
    "dedup_within_watermark",
    "run_to_memory",
    "sequence_gap_monitor",
    "stream_events",
    "windowed_counts",
    "IngestConfig",
    "IngestResult",
    "classify_pairs",
    "ingest_batch",
    "start_ingest_stream",
    "create_task",
    "read_tasks",
]

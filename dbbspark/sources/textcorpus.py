"""JSONL / CSV document-corpus sources with corrupt-record routing
(training-pipeline closure: crawl dumps and vendor drops arrive as
JSON-lines or CSV, never as clean parquet).

Same dead-letter philosophy as the ingest quarantine (streaming/
ingest.py S11): a malformed line must never fail the job OR silently
vanish — it is routed to a rejected relation carrying the raw line, and
the accepted relation stays schema-clean. Spark-first mechanics:
PERMISSIVE mode with `columnNameOfCorruptRecord` makes the parser emit
the raw text of unparseable lines into a side column in the SAME scan —
one read, two outputs, no second pass over the corpus. (DROPMALFORMED
would lose them; FAILFAST would kill a 100 TB job for one bad line.)

Caveat pinned by tests: under PERMISSIVE a row where the line PARSES but
a field's type mismatches gets the bad field nulled and ALSO records the
raw line in the corrupt column — classification is "any corruption",
not "whole line unparseable", which is the conservative side for
training data (a half-parsed doc is a rejected doc)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from dbbspark.session import cut_lineage

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: "T.StructType") -> "T.StructType":
    """schema + the corrupt-record side column, as a NEW StructType —
    StructType.add mutates in place, which would silently grow the
    caller's schema (and DOC_SCHEMA module-global) on every read."""
    return T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _split(parsed: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected): rejected keeps ONLY the raw line (plus any
    fields that did parse, for triage); accepted drops the side column
    and is exactly `schema`-shaped."""
    # Spark requires the corrupt column be materialized (cache or a
    # separate action) before filtering on it — referencing it straight
    # off the scan is documented to return wrong results. A localCheckpoint
    # pins one parse, same pattern as the dedup operators.
    parsed = parsed.transform(cut_lineage, eager=False)
    accepted = (
        parsed.where(F.col(_CORRUPT).isNull())
        .drop(_CORRUPT)
        .select(*[f.name for f in schema.fields])
    )
    rejected = parsed.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line"),
        *[f.name for f in schema.fields],
    )
    return accepted, rejected


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines corpus → (accepted, rejected)."""
    with_corrupt = _with_corrupt(schema)
    parsed = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _split(parsed, schema)


def read_csv_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV corpus → (accepted, rejected). Multiline quoted fields stay
    OFF: multiLine=true forces whole-file (non-splittable) parsing — at
    100 TB every input split matters, so embedded newlines must be
    escaped upstream instead."""
    with_corrupt = _with_corrupt(schema)
    parsed = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split(parsed, schema)

"""Multimodal columns: opaque binary content + typed metadata (SURVEY.md
§2.11 C5, §2.10 U3).

The reference treats file bytes as opaque except for a per-filetype plugin
that extracts a declared keyword schema from them (FITS headers,
`etc/decam_src_keywords.txt`; invoked at `bin/save_DBB_stagein_to_DBB.py:160`).
The Spark-native form: a `binary` column travels with the row; extraction
is an Arrow-batched transform over `mapInPandas` producing a typed struct
next to the bytes.

Decoders for real media formats (image resize, audio resample, frame
sampling) need libraries not present in this container; they are STUBBED
behind `register_decoder` with a deterministic fake as the default, but the
Spark-side plumbing — schema, batch iteration, partition sizing — is real
and tested.

Scale notes:
- `binaryFile` prunes `content` when unprojected, so metadata-only plans
  never read bytes;
- extraction runs per Arrow batch (`spark.sql.execution.arrow
  .maxRecordsPerBatch` bounds memory per task), not per row;
- keep bytes out of shuffles: extract → drop `content` → then join/agg.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Binary document reader

def read_binary_docs(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of opaque files as (path, modificationTime, length,
    content) — the multimodal base table (SURVEY.md §1.4 "binary file
    content")."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


# ---------------------------------------------------------------------------
# kv-text metadata extraction (the "FITS header" stand-in; JVM-free parse
# happens in pandas over Arrow batches)

def extract_kv_metadata(
    df: DataFrame,
    keywords: dict[str, bool],
    content_col: str = "content",
) -> DataFrame:
    """Extract a declared keyword schema out of kv-text file bytes.

    ``keywords`` maps KEYWORD -> required? (the R flag of
    `etc/decam_src_keywords.txt`; SURVEY.md §1.1.2). Output adds a
    ``meta`` struct column with one nullable string field per keyword plus
    ``meta_missing_required`` listing absent R-flagged keys (ingest routes
    those rows to quarantine instead of aborting, unlike the reference's
    SystemExit at `bin/save_DBB_stagein_to_DBB.py:212-215`).
    """
    meta_schema = T.StructType(
        [T.StructField(k.lower(), T.StringType(), True) for k in keywords]
    )
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("meta", meta_schema, True),
            T.StructField(
                "meta_missing_required", T.ArrayType(T.StringType()), True
            ),
        ]
    )
    required = [k for k, req in keywords.items() if req]
    keys = list(keywords)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, missings = [], []
            for raw in pdf[content_col]:
                kv: dict[str, str | None] = {}
                if raw is not None:
                    for line in bytes(raw).decode("utf-8", "replace").splitlines():
                        if "=" in line:
                            k, v = line.split("=", 1)
                            kv[k.strip().upper()] = v.strip()
                metas.append({k.lower(): kv.get(k) for k in keys})
                missings.append([k for k in required if kv.get(k) is None])
            pdf = pdf.copy()
            pdf["meta"] = metas
            pdf["meta_missing_required"] = missings
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


# ---------------------------------------------------------------------------
# Media decode stubs (image/audio/video feature extraction)

_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(kind: str, fn: Callable[[bytes], dict]) -> None:
    """Register a real decoder (e.g. PIL-based image resize) for ``kind``.
    The container has no media libs, so tests use the deterministic fake."""
    _DECODERS[kind] = fn


def _fake_decode(raw: bytes) -> dict:
    """Deterministic stand-in for a media decoder: stable pseudo-features
    derived from a content digest. Replace via `register_decoder`."""
    h = hashlib.sha256(raw).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "n_frames": 1 + h[2] % 8,
        "feature": [b / 255.0 for b in h[:8]],
    }


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(
    df: DataFrame, kind: str = "image", content_col: str = "content"
) -> DataFrame:
    """Attach decoded media features as a ``decoded`` struct column.

    Runs the registered decoder for ``kind`` (deterministic fake unless a
    real one was registered) over Arrow batches via mapInPandas — the
    production shape for "decode 100 TB of images": one Python worker per
    task, bytes never leave the executor, output is a narrow typed struct.
    """
    decoder = _DECODERS.get(kind, _fake_decode)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("decoded", DECODE_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["decoded"] = [
                None if raw is None else decoder(bytes(raw))
                for raw in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)

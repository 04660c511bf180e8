"""Multimodal-column layer as declared queries (SURVEY.md §2.11 C5, §2.10
U3).

The fixtures carry no real media files, so binary content is synthesized
in-plan (`cast(text as binary)`) — the POINT is the plumbing: binary
column + Arrow-batched extraction into a typed struct. The decode stub is
a deterministic sha256-derived feature fake (sources/multimodal.py), which
makes it SQL-expressible: the oracle recomputes the same integers from
DuckDB's sha256, so the whole mapInPandas path is hash-verified, not just
rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..operators.phash import dhash_col, dhash_oracle_sql, fake_thumb_sql, thumbnails
from ..sources.multimodal import decode_media, extract_kv_metadata
from ..tables import load_table

# C56 fold: the perceptual-hash pipeline over the deterministic fake
# thumbnail (sha256-derived byte grid — the kinds-without-codecs path),
# reconstructed bit-for-bit in DuckDB. The REAL codec thumbs (pgm/ppm/
# fits/wav block means) share the exact same JVM hash expression and are
# value-pinned against planted resized/re-encoded duplicates in
# tests/test_phash.py.
_DHASH_ORACLE = dhash_oracle_sql(lambda i: fake_thumb_sql("text", i))


@query(
    "q_multimodal_decode",
    oracle=f"""
    SELECT doc_id,
           64 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) AS width,
           64 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) AS height,
           1 + CAST(('0x' || substr(sha256(text), 5, 2)) AS INT) % 8 AS n_frames,
           {_DHASH_ORACLE} AS dhash
    FROM documents
    """,
    doc="C5+C56 (folded r7): multimodal decode plumbing — binary column → "
    "mapInPandas decoder → typed struct — plus the perceptual-hash leg: "
    "thumbnail extraction (mapInPandas) → 64-bit dHash as one JVM "
    "projection (operators/phash.py). Both stubs derive from "
    "sha256(content), so DuckDB recomputes the exact integers: the Arrow "
    "batch path AND the 64-term hash assembly (incl. the bit-63 min-long "
    "special case) are value-verified, not just row-counted.",
    tags=("multimodal", "closure"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    decoded = decode_media(docs)
    hashed = thumbnails(decoded, kind="image").select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.n_frames").alias("n_frames"),
        dhash_col("thumb").alias("dhash"),
    )
    return hashed


@query(
    "q_metadata_extract",
    oracle="""
    SELECT doc_id,
           lang AS meta_lang,
           source AS meta_source,
           '' AS missing
    FROM documents
    """,
    doc="U3: declared-schema metadata extraction — kv-text bytes → struct "
    "with R-flag enforcement (etc/decam_src_keywords.txt semantics; "
    "bin/save_DBB_stagein_to_DBB.py:160,212-215). kv content synthesized "
    "from documents columns, so the oracle knows every expected value; "
    "required-key misses surface in `missing` instead of aborting "
    "(comma-joined string — driver-hashable, unlike an array column).",
    tags=("multimodal", "udf", "closure"),
)
def q_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.format_string("LANG = %s\nSOURCE = %s", "lang", "source")
        .cast("binary")
        .alias("content"),
    )
    out = extract_kv_metadata(docs, {"LANG": True, "SOURCE": False})
    return out.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.source").alias("meta_source"),
        F.array_join(F.sort_array(F.col("meta_missing_required")), ",").alias("missing"),
    )

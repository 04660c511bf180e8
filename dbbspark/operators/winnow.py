"""Winnowing document fingerprints — local-minimum k-gram sampling for
plagiarism/clone detection (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
the MOSS algorithm; training-pipeline closure operator, SURVEY.md §2.11
C43, the standard code-corpus near-dup primitive where shingle MinHash
is too coarse: winnowing GUARANTEES any shared substring of length
>= w + k - 1 contributes at least one shared fingerprint).

Everything is higher-order array expressions over the normalized text —
no Python in the plan:

1. k-gram hashes: ``transform(sequence(...), i -> xxhash64(substring))``
2. window minima:  ``transform(sequence(...), j -> array_min(slice(h, j, w)))``
3. fingerprints:   ``array_distinct`` of the window minima (positions are
   irrelevant for set-overlap detection, which makes the classic
   rightmost-tiebreak unnecessary — ties collapse in the distinct).

Overlap detection then rides the SAME posting-list blocking as the
Jaccard family (operators/dedup.py): explode fingerprints → df-capped
grouped postings → pair counts. A fingerprint shared by thousands of
documents (a license header) is exactly the max_df hub the cap exists
for.

Scale shape: fingerprinting is map-only and fuses into the scan; the
per-doc fingerprint count is ~len/w on random text (the winnowing
density bound 2/(w+1) per position), so the exploded relation is a
w-fold REDUCTION of the k-gram relation the plain shingle join would
ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def gram_hashes_expr(text: str, k: int) -> str:
    """SQL for the k-gram xxhash64 array of `text` (empty for null/short)."""
    return (
        f"CASE WHEN {text} IS NULL THEN cast(array() as array<bigint>) ELSE "
        f"transform(sequence(1, greatest(length({text}) - {k - 1}, 0)), "
        f"i -> xxhash64(substring({text}, i, {k}))) END"
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """(id, fingerprints array<bigint>): winnowed k-gram fingerprints.

    Guarantee (Schleimer et al. §3): two documents sharing any substring
    of length >= w + k - 1 share at least one fingerprint; no shared
    substring shorter than k is ever detected. Map-only, JVM-only.

    Short documents (fewer than w k-grams) still yield ONE fingerprint —
    the global min of their k-grams — so no document silently drops out
    of overlap detection; empty/null text yields an empty array.

    The gram array lives in its OWN projection: CollapseProject refuses
    to merge projections when a non-cheap producer expression is
    referenced more than once, so the O(len·k) gram hashing runs once
    per row rather than once per window position inside the lambda.
    Window minima are then O(len·w) — the textbook naive winnow, fine
    for the small w (4-16) the guarantee wants.
    """
    with_g = docs.select(
        F.col(id_col), F.expr(gram_hashes_expr(text_col, k)).alias("_g")
    )
    fp = (
        "CASE WHEN size(_g) = 0 THEN cast(array() as array<bigint>) "
        f"WHEN size(_g) < {w} THEN array(array_min(_g)) "
        f"ELSE array_distinct(transform(sequence(1, size(_g) - {w - 1}), "
        f"j -> array_min(slice(_g, j, {w})))) END"
    )
    return with_g.select(F.col(id_col), F.expr(fp).alias("fingerprints"))


def fingerprint_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 1000,
) -> DataFrame:
    """(a, b, shared, containment) for document pairs sharing at least
    ``min_shared`` winnowed fingerprints; ``containment`` = shared /
    min(|fp_a|, |fp_b|) — the MOSS-style report score.

    Posting-list blocking, one explode + one groupBy + one self-join on
    grouped postings: a fingerprint in more than ``max_df`` documents
    (boilerplate/license hubs) is dropped from pair GENERATION but kept
    in the per-doc sizes, so containment denominators stay exact —
    the same hub-capping contract as `jaccard_pairs`.
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w).where(
        F.size("fingerprints") > 0
    )
    sized = fps.select(
        F.col(id_col).alias("_id"),
        F.size("fingerprints").alias("_nfp"),
        F.explode("fingerprints").alias("fp"),
    )
    posted = sized.groupBy("fp").agg(
        F.collect_list(F.struct("_id", "_nfp")).alias("ds")
    )
    kept = posted.where(F.size("ds") >= 2)
    if max_df is not None:
        kept = kept.where(F.size("ds") <= max_df)
    pairs = kept.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), y -> "
                "CASE WHEN x._id < y._id THEN struct(x._id as a, y._id as b, "
                "x._nfp as na, y._nfp as nb) "
                "ELSE struct(y._id as a, x._id as b, y._nfp as na, x._nfp as nb) "
                "END)))"
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.na", "p.nb")
    return (
        pairs.groupBy("a", "b", "na", "nb")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= F.lit(min_shared))
        .select(
            "a",
            "b",
            "shared",
            (F.col("shared") / F.least("na", "nb")).alias("containment"),
        )
    )

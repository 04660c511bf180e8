"""Video / frame-sequence perceptual near-dup (SURVEY.md §2.11 — the
C5 × C56 composition; VERDICT r7 item 1 / r8 item 2, the last media
modality without a content fingerprint).

A re-encoded, resized, frame-dropped, or trimmed copy of a clip shares
no bytes with the original, so the exact-checksum gate (the reference's
dup test, bin/save_DBB_stagein_to_DBB.py:100-109) and even the still-
image perceptual gate (operators/phash.py) can't see it — a clip is a
SEQUENCE, and its identity has to survive temporal edits. This module
closes that gap Spark-first, reusing every proven piece:

1. **Clip fingerprinting** — ONE Arrow-batched mapInPandas crossing per
   clip: frame COUNT by header walk (sources/codecs.py `_pnm_walk` —
   rasters skipped by computed length), evenly-spaced index selection
   (the C5 sample-before-decode policy, sources/multimodal.py
   `sample_frames`), decode ONLY those rasters, and a 9×9 block-mean
   thumbnail per sampled frame. The wide binary column never leaves the
   scan stage; what shuffles is n_samples tiny arrays per clip.
2. **Per-frame 64-bit dHash — pure JVM** (`operators.phash.dhash_col`
   over the exploded frame relation): the same horizontal-gradient-sign
   fingerprint stills use, stable under re-encode (monotone sample
   scaling) and resize (block means are area averages).
3. **Frame-level Hamming-ball banding** — `operators.phash.
   hamming_pairs` over composite (clip, frame) ids: band-split →
   equi-join → `bit_count` verify → exactly-once canonical emission.
   Candidates cost Σ bucket² over (band, value) buckets, never
   |frames|²; with constant n_samples per clip the frame corpus is just
   n_samples × the clip corpus — the stills shape, at stills cost.
4. **Clip-pair scoring** — frames match REGARDLESS of index (temporal
   offsets and frame drops shift indices; requiring alignment would
   miss exactly the edits that matter), then one narrow groupBy on
   (clip_a, clip_b) counts how many of each side's sampled frames found
   a near frame on the other side. A pair is a near-dup when BOTH
   fractions reach ``min_frac`` — one-sided containment (a clip vs a
   montage embedding one of its scenes) surfaces below the symmetric
   threshold and is the caller's policy call.

Downstream, scored pairs feed the SAME machinery every other dedup
family uses: C12 `connected_components_adaptive` for clusters, C50
`audit_clusters` for purity before deletion.

The container is concatenated binary netpbm (``pnmseq``) — a real
public format (the netpbm spec allows back-to-back images) whose frames
are seekable by header arithmetic alone, i.e. the property
sample-before-decode needs; `register_clip_extractor` is the seam for
real seekable codecs at deployment.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..session import cut_lineage
from .phash import GRID, _block_mean, dhash_col, hamming_pairs

_CLIP_EXTRACTORS: dict[
    str,
    tuple[Callable[[bytes], int], Callable[[bytes, list[int]], list[np.ndarray]]],
] = {}


def register_clip_extractor(
    kind: str,
    count_fn: Callable[[bytes], int],
    extract_gray_fn: Callable[[bytes, list[int]], list[np.ndarray]],
) -> None:
    """Register a seekable-clip codec for ``kind``: ``count_fn`` returns
    the frame count WITHOUT decoding rasters; ``extract_gray_fn``
    returns 2-D grayscale float arrays for exactly the requested frame
    indices (built-in: ``pnmseq``)."""
    _CLIP_EXTRACTORS[kind] = (count_fn, extract_gray_fn)


def _load_default_extractors() -> None:
    if "pnmseq" in _CLIP_EXTRACTORS:
        return
    from ..sources.codecs import pnm_seq_extract_gray, pnm_seq_frame_count

    register_clip_extractor("pnmseq", pnm_seq_frame_count, pnm_seq_extract_gray)


def _sample_idxs(n: int, k: int) -> list[int]:
    """The `sample_frames` index policy: round(i·(n-1)/(k-1)), first and
    last frame always included; all n when n <= k."""
    if n <= k:
        return list(range(n))
    return sorted({round(i * (n - 1) / (k - 1)) for i in range(k)})


def clip_fingerprints(
    df: DataFrame,
    kind: str = "pnmseq",
    id_col: str = "path",
    content_col: str = "content",
    n_samples: int = 8,
    grid: int = GRID,
) -> DataFrame:
    """(id, n_frames, n_sampled, fidx, fhash): one row per SAMPLED frame
    of each clip, ``fhash`` its 64-bit block-mean dHash and ``fidx`` the
    real frame index in the container. One mapInPandas decode crossing
    (count → sample → decode-only-sampled → thumbnail); the hash itself
    is the JVM `dhash_col` projection over the exploded frame relation —
    no Python past the thumbnails, nothing wide past the scan. Malformed
    clips yield no rows (quarantine's concern, the decode_media stance);
    an unregistered ``kind`` raises at plan time (a clip corpus has no
    meaningful deterministic fake — the thumbnails() seam discussion)."""
    if n_samples <= 0:
        raise ValueError("n_samples must be positive")
    _load_default_extractors()
    if kind not in _CLIP_EXTRACTORS:
        raise ValueError(
            f"clip_fingerprints: no registered clip extractor for "
            f"kind={kind!r} (registered: {sorted(_CLIP_EXTRACTORS)}); "
            "register_clip_extractor(kind, count_fn, extract_gray_fn)"
        )
    count_fn, extract_fn = _CLIP_EXTRACTORS[kind]
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField(
                "fsamples",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("fidx", T.IntegerType(), False),
                            T.StructField(
                                "thumb", T.ArrayType(T.DoubleType()), False
                            ),
                        ]
                    )
                ),
                True,
            ),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ident, raw in zip(pdf[id_col], pdf[content_col]):
                if raw is None:
                    continue
                try:
                    raw = bytes(raw)
                    n = count_fn(raw)
                    idxs = _sample_idxs(n, n_samples)
                    grays = extract_fn(raw, idxs)
                    samples = [
                        (int(i), [float(x) for x in _block_mean(g, grid).ravel()])
                        for i, g in zip(idxs, grays)
                    ]
                    rows.append((ident, int(n), samples))
                except Exception:
                    continue  # malformed clip → no frame rows
            yield pd.DataFrame(rows, columns=[id_col, "n_frames", "fsamples"])

    exploded = (
        df.mapInPandas(run, schema=out_schema)
        .select(
            id_col,
            "n_frames",
            F.size("fsamples").alias("n_sampled"),
            F.explode("fsamples").alias("s"),
        )
        .select(
            id_col,
            "n_frames",
            "n_sampled",
            F.col("s.fidx").alias("fidx"),
            dhash_col("s.thumb", grid=grid).alias("fhash"),
        )
    )
    return exploded


def video_near_dup(
    df: DataFrame,
    kind: str = "pnmseq",
    id_col: str = "path",
    content_col: str = "content",
    n_samples: int = 8,
    max_distance: int = 6,
    min_frac: float = 0.5,
    bands: int | None = None,
) -> DataFrame:
    """(id_a, id_b, frac_a, frac_b, n_frame_pairs, min_distance): clip
    pairs where at least ``min_frac`` of EACH side's sampled frames has
    a near frame (Hamming ≤ ``max_distance``) on the other side, id_a <
    id_b. Robust by construction to re-encoding and resizing (per-frame
    dHash), frame drops and temporal offsets (index-free frame matching
    + fractional threshold); disjoint clips share no frame buckets and
    never pair.

    Scale shape: one decode pass (lineage cut — the frame relation
    feeds both the band join and the per-clip size lookup), the stills
    banding join at n_samples × clip-corpus cardinality, then ONE narrow
    groupBy on clip pairs and an AQE-handled size join. Nothing is ever
    all-pairs at the clip or frame level.

    Feed the pairs to `connected_components_adaptive` for clusters and
    `audit_clusters` before keep-one deletion, exactly as for text LSH
    and still-image near-dup."""
    if not 0.0 < min_frac <= 1.0:
        raise ValueError("min_frac must be in (0, 1]")
    frames = cut_lineage(
        clip_fingerprints(
            df,
            kind=kind,
            id_col=id_col,
            content_col=content_col,
            n_samples=n_samples,
        )
    )
    return score_clip_pairs(
        frames,
        id_col=id_col,
        max_distance=max_distance,
        min_frac=min_frac,
        bands=bands,
    )


def score_clip_pairs(
    frames: DataFrame,
    id_col: str = "path",
    max_distance: int = 6,
    min_frac: float = 0.5,
    bands: int | None = None,
) -> DataFrame:
    """The pure-JVM scoring half of `video_near_dup`, over an existing
    `clip_fingerprints` relation (id, n_sampled, fidx, fhash) — lets a
    pipeline fingerprint once and score under several thresholds, and
    keeps the decode cost and the pair cost separately measurable.
    ``frames`` is traversed twice (band join + size lookup); pass it
    lineage-cut or cached.

    Hub hazard (the `hamming_pairs` constant-media note, one level
    down): DEGENERATE frames — solid black, fades, test cards — share
    one hash across the whole corpus, so M clips containing one emit
    O(M²) frame pairs before the clip-pair groupBy collapses them
    (partial aggregation and AQE skew-splitting keep the join itself
    balanced; the pair VOLUME is inherent). They cannot simply be
    dropped — two all-black clips ARE near-dups — so at corpus scale
    pre-filter frames by thumb variance under a policy threshold, or
    route hot buckets through `hamming_groups`' rep-graph form and
    treat membership in a degenerate-frame group as its own signal."""
    if not 0.0 < min_frac <= 1.0:
        raise ValueError("min_frac must be in (0, 1]")
    # composite (clip, frame) id: struct comparison is lexicographic, so
    # cross-clip pairs come out clip-major (id_a.cid < id_b.cid) and the
    # stills banding machinery applies unchanged, canonical emission
    # included
    with_fid = frames.select(
        F.struct(
            F.col(id_col).alias("cid"), F.col("fidx").alias("fidx")
        ).alias("_fid"),
        "fhash",
    )
    fpairs = hamming_pairs(
        with_fid, "_fid", "fhash", max_distance=max_distance, bands=bands
    ).where(F.col("id_a.cid") != F.col("id_b.cid"))
    scored = fpairs.groupBy(
        F.col("id_a.cid").alias("id_a"), F.col("id_b.cid").alias("id_b")
    ).agg(
        F.countDistinct("id_a.fidx").alias("_m_a"),
        F.countDistinct("id_b.fidx").alias("_m_b"),
        F.count("*").alias("n_frame_pairs"),
        F.min("distance").alias("min_distance"),
    )
    sizes = frames.groupBy(id_col).agg(F.max("n_sampled").alias("_n"))
    return (
        scored.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_n_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (F.col("_m_a") / F.col("_n_a")).alias("frac_a"),
            (F.col("_m_b") / F.col("_n_b")).alias("frac_b"),
            "n_frame_pairs",
            "min_distance",
        )
        .where(
            (F.col("frac_a") >= min_frac) & (F.col("frac_b") >= min_frac)
        )
    )

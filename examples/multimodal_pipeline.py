"""End-to-end MULTIMODAL curation on synthetic real-format media — the
binary-side counterpart of curation_pipeline.py, composed from dbbspark
parts:

    real bytes (PGM images + PCM WAV audio, written by the package's own
    encoders) → decode through the pluggable codec seam → per-item
    feature vectors → semantic dedup via the ANN-index gate (IVFPQ
    corpus memory) → WebDataset tar shard export of the survivors

Run: python examples/multimodal_pipeline.py
Prints one JSON line per stage: {"stage": ..., "items": ...}.

Every stage is the production shape: decode is Arrow-batched
mapInPandas over a binary column (bytes never leave the executor),
dedup state is the compact IVFPQ index (not the media), and the export
is a byte-deterministic tar stream. The fixture media is synthesized
in-memory with the same encoders the codec tests round-trip through
(sources/codecs.py) — real file formats, no external libraries."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbbspark.operators.pq import train_ivfpq
from dbbspark.operators.shards import build_tar_shards
from dbbspark.session import get_spark
from dbbspark.sources.codecs import encode_pgm, encode_wav
from dbbspark.sources.multimodal import decode_media
from dbbspark.streaming.annindex import _index_codes, gate_batch


def _image(seed: int, dup_of: int | None = None) -> bytes:
    """A 36x36 PGM whose intensity DISTRIBUTION (base level + contrast)
    AND spatial pattern (two seed-keyed sinusoid components) vary with
    the seed, so distinct seeds are semantically distinct under the
    decode feature (mean/std/range/histogram) and perceptually distinct
    under the block-mean dHash (cross-seed Hamming distance ≥ 14
    measured — a modular-sawtooth pattern here would give every seed
    the SAME gradient signs and collapse the perceptual stage); dup_of
    makes a byte-identical copy of another seed's image."""
    s = dup_of if dup_of is not None else seed
    rng = np.random.default_rng(s)
    y, x = np.mgrid[0:36, 0:36]
    base = (s * 37) % 150
    contrast = 1 + (s % 4)
    f = np.zeros((36, 36))
    for _ in range(2):
        fy, fx = rng.uniform(0.5, 2.5, 2)
        ph = rng.uniform(0, 2 * np.pi)
        f += np.sin(2 * np.pi * fx * x / 36 + ph) * np.cos(2 * np.pi * fy * y / 36)
    arr = np.clip(base + contrast * 12 * (2 + f), 0, 255).astype(np.uint8)
    return encode_pgm(arr)


def _audio(seed: int) -> bytes:
    t = np.arange(1600) / 16000.0
    return encode_wav(np.sin(2 * np.pi * (200 + 50 * (seed % 6)) * t) * 0.5)


def run(spark) -> dict[str, int]:
    out: dict[str, int] = {}

    def stage(name: str, df, n=None):
        out[name] = n if n is not None else df.count()
        print(json.dumps({"stage": name, "items": out[name]}))
        return df

    # 0. synthesize a mixed-media corpus: 30 distinct images + 5 exact
    # dups of earlier ones + 4 RESIZED (2×) copies of earlier ones —
    # perceptual dups sharing no bytes — + 12 audio clips over 6
    # frequencies (so each frequency appears twice — 6 semantic dup
    # pairs)
    from dbbspark.sources.codecs import resize_netpbm

    rows = [(i, _image(i), "pgm") for i in range(30)]
    rows += [(100 + i, _image(100 + i, dup_of=i), "pgm") for i in range(5)]
    rows += [
        (300 + i, resize_netpbm(_image(i), 72, 72), "pgm") for i in range(4)
    ]
    rows += [(200 + i, _audio(i), "wav") for i in range(12)]
    media = spark.createDataFrame(
        rows, "item_id long, content binary, kind string"
    ).cache()
    stage("input", media)

    # 0a. PERCEPTUAL near-dup keep-one over the image bytes (C56 → C12,
    # the cli media-dedup chain): resized/re-encoded copies share no
    # bytes, so the exact-identity gate downstream can't see them — the
    # block-mean dHash can. Keep the min item_id per Hamming group and
    # drop a member only on DIRECT distance evidence against its kept
    # representative (the C50 verify-before-delete stance — CC welds
    # transitively, deletion must not).
    from dbbspark.operators.phash import dhash_col, hamming_groups, thumbnails
    from dbbspark.session import cut_lineage

    hashed = cut_lineage(
        thumbnails(
            media.where(F.col("kind") == "pgm").select("item_id", "content"),
            kind="pgm",
        ).select("item_id", dhash_col("thumb").alias("phash"))
    )
    groups = hamming_groups(hashed, "item_id", "phash", max_distance=6)
    keeps = groups.groupBy("group").agg(F.min("item_id").alias("keep"))
    drops = (
        groups.join(keeps, "group")
        .where(F.col("item_id") != F.col("keep"))
        .join(hashed, "item_id")
        .join(
            hashed.select(
                F.col("item_id").alias("keep"), F.col("phash").alias("keep_hash")
            ),
            "keep",
        )
        .where(F.bit_count(F.col("phash").bitwiseXOR(F.col("keep_hash"))) <= 6)
        .select("item_id")
    )
    media = media.join(drops, "item_id", "left_anti").cache()
    stage("phash_dedup", media)

    # 0b. input normalization: resize every image to a fixed 16×16
    # through the resize leg (decode → nearest-neighbor → re-encode as
    # real PGM bytes) — the thumbnail/input-standardization step a
    # training pipeline runs BEFORE feature extraction; audio passes
    # through untouched.
    from dbbspark.sources.multimodal import resize_media

    images = resize_media(
        media.where(F.col("kind") == "pgm"), 16, 16, kind="pgm"
    ).select(
        "item_id", F.col("resized.content").alias("content"), "kind"
    )
    media = images.unionByName(
        media.where(F.col("kind") != "pgm")
    ).cache()
    stage("resized", media.where(F.col("content").isNotNull()))

    # 1. decode through the codec seam, per format kind — the decoded
    # struct carries an 8-dim feature vector for every item
    decoded = None
    for kind in ("pgm", "wav"):
        part = decode_media(media.where(F.col("kind") == kind), kind=kind)
        decoded = part if decoded is None else decoded.unionByName(part)
    feats = decoded.select(
        F.col("item_id").alias("vec_id"),
        F.col("decoded.feature").alias("embedding"),
        "kind",
    ).cache()
    stage("decoded", feats.where(F.col("embedding").isNotNull()))

    # 1b. standardize features per dimension ((x-μ)/σ — one aggregate
    # for the moments, then a map-only transform). Raw decode stats all
    # live in the positive orthant, where cosine between DISTINCT items
    # is ~0.99 (measured); centering is what makes cosine a usable
    # dissimilarity — the same reason SemDeDup whitens embeddings.
    d = 8
    moments = feats.agg(
        *[F.avg(F.col("embedding")[i]).alias(f"m{i}") for i in range(d)],
        *[F.stddev_pop(F.col("embedding")[i]).alias(f"s{i}") for i in range(d)],
    ).first()
    mu = [moments[f"m{i}"] or 0.0 for i in range(d)]
    sd = [max(moments[f"s{i}"] or 0.0, 1e-9) for i in range(d)]
    vecs = feats.select(
        "vec_id",
        F.array(
            *[
                (F.col("embedding")[i] - F.lit(mu[i])) / F.lit(sd[i])
                for i in range(d)
            ]
        ).alias("embedding"),
    )

    # 2. semantic dedup via the ANN gate: IVFPQ quantizer trained on the
    # corpus features, exact vector-hash identity + ADC threshold
    # rejection. (Batch caller of the streaming gate — same logic.)
    cents = spark.createDataFrame(
        [(0, [-1.0] * 8), (1, [0.0] * 8), (2, [1.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    books = train_ivfpq(vecs, cents, m=4, k=8)
    empty = _index_codes(spark, os.path.join("/nonexistent", "annidx"))
    accepted, _codes = gate_batch(vecs, empty, cents, books, eps=0.005)
    accepted = accepted.cache()
    stage("semantic_dedup", accepted)

    # 3. export survivors as WebDataset tar shards (payload = original
    # bytes, sidecar json = kind)
    keep = media.join(
        accepted.select(F.col("vec_id").alias("item_id")), "item_id", "left_semi"
    )
    shards = build_tar_shards(
        keep.select(F.col("item_id").alias("doc_id"), "content", "kind"),
        shard_bytes=4096,
        ext="bin",
        meta_cols=["kind"],
    )
    totals = shards.agg(
        F.count("*").alias("n"), F.sum("bytes").alias("b")
    ).first()
    print(
        json.dumps(
            {"stage": "tar_shards", "count": int(totals["n"]), "bytes": int(totals["b"])}
        )
    )
    out["tar_shards"] = int(totals["n"])
    return out


if __name__ == "__main__":
    run(get_spark("multimodal-example"))

"""Video / frame-sequence perceptual near-dup (operators/video.py) and
the concatenated-netpbm container codecs it rides on
(sources/codecs.py pnm_seq_*): a re-encoded / resized / frame-dropped /
trimmed copy of a clip must pair with its original through the full
count → sample → decode-only-sampled → dHash → banding → clip-score
chain; disjoint clips must not."""

from __future__ import annotations

import numpy as np
import pytest

from dbbspark.sources.codecs import (
    decode_pnm_seq,
    encode_pgm,
    encode_pnm_seq,
    pnm_seq_extract_features,
    pnm_seq_extract_gray,
    pnm_seq_frame_count,
)


def _clip(n=24, h=48, w=64, phase=0.0, fx=2.0, fy=1.5, seed=None):
    """Smooth space-time field: gradient-rich per frame, slowly varying
    across frames (so temporally-adjacent frames hash close — what real
    video looks like between cuts). seed→pure-noise frames instead
    (matches nothing)."""
    if seed is not None:
        rng = np.random.default_rng(seed)
        return [
            rng.integers(0, 256, size=(h, w)).astype(np.uint8)
            for _ in range(n)
        ]
    y, x = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        f = 128 + 80 * np.sin(
            2 * np.pi * fx * x / w + 0.12 * t + phase
        ) * np.cos(2 * np.pi * fy * y / h - 0.08 * t)
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return out


# ---------------------------------------------------------------------------
# container codec (ADVICE r8: the pnm_seq_* trio must earn its place)


def test_frame_count_and_selective_extract():
    frames = _clip(n=7)
    raw = encode_pnm_seq(frames)
    assert pnm_seq_frame_count(raw) == 7
    got = pnm_seq_extract_gray(raw, [0, 3, 6])
    for g, idx in zip(got, [0, 3, 6]):
        np.testing.assert_array_equal(g, frames[idx].astype(np.float64))
    # request order is preserved, duplicates allowed
    got = pnm_seq_extract_gray(raw, [6, 0, 6])
    np.testing.assert_array_equal(got[0], frames[6].astype(np.float64))
    np.testing.assert_array_equal(got[1], frames[0].astype(np.float64))
    np.testing.assert_array_equal(got[2], frames[6].astype(np.float64))


def test_16bit_and_color_frames():
    gray16 = [(f.astype(np.uint16) * 257) for f in _clip(n=3)]
    raw = encode_pnm_seq(gray16, maxval=65535)
    assert pnm_seq_frame_count(raw) == 3
    got = pnm_seq_extract_gray(raw, [1])
    np.testing.assert_array_equal(got[0], gray16[1].astype(np.float64))
    # color frames decode to their channel mean
    rgb = np.stack(
        [_clip(n=1)[0], _clip(n=1, phase=1.0)[0], _clip(n=1, phase=2.0)[0]],
        axis=2,
    )
    raw = encode_pnm_seq([rgb])
    got = pnm_seq_extract_gray(raw, [0])
    np.testing.assert_allclose(got[0], rgb.astype(np.float64).mean(axis=2))


def test_mixed_sequence_and_comment_headers():
    """Frames of different sizes walk correctly (each header re-read),
    and '#' comments inside a frame header are skipped."""
    a = _clip(n=1, h=16, w=20)[0]
    b = _clip(n=1, h=32, w=8)[0]
    raw = encode_pnm_seq([a]) + encode_pgm(b) + encode_pnm_seq([a])
    assert pnm_seq_frame_count(raw) == 3
    got = pnm_seq_extract_gray(raw, [1])
    np.testing.assert_array_equal(got[0], b.astype(np.float64))
    # encode_pgm writes a comment line — splice an extra one mid-stream
    commented = b"P5\n# a comment\n# another\n2 2\n255\n" + bytes(
        [1, 2, 3, 4]
    )
    raw2 = commented + encode_pgm(a)
    assert pnm_seq_frame_count(raw2) == 2
    np.testing.assert_array_equal(
        pnm_seq_extract_gray(raw2, [0])[0], [[1.0, 2.0], [3.0, 4.0]]
    )


def test_malformed_sequences_raise():
    frames = _clip(n=3)
    raw = encode_pnm_seq(frames)
    with pytest.raises(ValueError, match="truncated"):
        pnm_seq_frame_count(raw[:-10])  # truncated raster
    with pytest.raises(ValueError, match="netpbm"):
        pnm_seq_frame_count(b"RIFF not pnm")
    with pytest.raises(ValueError, match="netpbm"):
        pnm_seq_frame_count(raw + b"garbage trailing bytes")
    with pytest.raises(ValueError, match="empty"):
        pnm_seq_frame_count(b"")
    with pytest.raises(ValueError, match="out of range"):
        pnm_seq_extract_gray(raw, [0, 3])
    # ascii (P2) frames are not a seekable container — refused
    with pytest.raises(ValueError, match="netpbm"):
        pnm_seq_frame_count(b"P2\n2 1\n255\n1 2\n")


def test_decode_and_sample_seam_registration(spark):
    """pnmseq flows through the C5 seams: decode_media reads header-walk
    n_frames + first-frame stats; sample_frames uses the registered
    extractor (features for exactly the sampled indices)."""
    from dbbspark.sources.multimodal import decode_media, sample_frames

    frames = _clip(n=10, h=12, w=16)
    raw = encode_pnm_seq(frames)
    d = decode_pnm_seq(raw)
    assert (d["width"], d["height"], d["n_frames"]) == (16, 12, 10)
    first = frames[0].astype(np.float64)
    assert d["feature"][0] == pytest.approx(first.mean())
    feats = pnm_seq_extract_features(raw, [2, 9])
    assert feats[0][0] == pytest.approx(frames[2].astype(np.float64).mean())

    df = spark.createDataFrame(
        [("clip1", bytearray(raw))], "path string, content binary"
    )
    dec = decode_media(df, kind="pnmseq").select("decoded.*").first()
    assert (dec["width"], dec["height"], dec["n_frames"]) == (16, 12, 10)
    rows = sample_frames(df, k=4, kind="pnmseq").collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6, 9]
    assert all(r["n_frames"] == 10 for r in rows)
    assert rows[1]["feature"][0] == pytest.approx(
        frames[3].astype(np.float64).mean()
    )


# ---------------------------------------------------------------------------
# clip fingerprints


def test_clip_fingerprints_shape_and_determinism(spark):
    from dbbspark.operators.video import clip_fingerprints

    raw = encode_pnm_seq(_clip(n=24))
    short = encode_pnm_seq(_clip(n=3, phase=2.0))
    df = spark.createDataFrame(
        [
            ("a", bytearray(raw)),
            ("s", bytearray(short)),
            ("bad", bytearray(b"not a clip")),
            ("nul", None),
        ],
        "path string, content binary",
    )
    rows = clip_fingerprints(df, n_samples=8).collect()
    by_clip: dict[str, list] = {}
    for r in rows:
        by_clip.setdefault(r["path"], []).append(r)
    assert set(by_clip) == {"a", "s"}  # malformed + null → no rows
    assert len(by_clip["a"]) == 8 and len(by_clip["s"]) == 3
    assert all(r["n_frames"] == 24 and r["n_sampled"] == 8 for r in by_clip["a"])
    assert sorted(r["fidx"] for r in by_clip["s"]) == [0, 1, 2]
    assert all(r["fhash"] is not None for r in rows)
    again = {
        (r["path"], r["fidx"]): r["fhash"]
        for r in clip_fingerprints(df, n_samples=8).collect()
    }
    assert again == {(r["path"], r["fidx"]): r["fhash"] for r in rows}


def test_clip_fingerprints_unregistered_kind_raises(spark):
    from dbbspark.operators.video import clip_fingerprints

    df = spark.createDataFrame([("a", None)], "path string, content binary")
    with pytest.raises(ValueError, match="no registered clip extractor"):
        clip_fingerprints(df, kind="mp4")


# ---------------------------------------------------------------------------
# end-to-end near-dup


def _variants():
    base = _clip(n=24)
    reenc16 = [(f.astype(np.uint16) * 257) for f in base]
    from dbbspark.sources.codecs import _nn_resize

    resized = [_nn_resize(f, 72, 96) for f in base]
    dropped = [f for i, f in enumerate(base) if i % 3 != 2]  # 1/3 dropped
    offset = base[3:]  # trimmed head
    noise = _clip(n=24, seed=7)
    return {
        "base": encode_pnm_seq(base),
        "reenc16": encode_pnm_seq(reenc16, maxval=65535),
        "resized": encode_pnm_seq(resized),
        "dropped": encode_pnm_seq(dropped),
        "offset": encode_pnm_seq(offset),
        "noise": encode_pnm_seq(noise),
    }


def test_video_near_dup_end_to_end(spark):
    from dbbspark.operators.video import video_near_dup

    clips = _variants()
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in clips.items()],
        "path string, content binary",
    )
    pairs = video_near_dup(df, n_samples=8, max_distance=6, min_frac=0.5)
    got = {(r["id_a"], r["id_b"]): r for r in pairs.collect()}
    for variant in ("reenc16", "resized", "dropped", "offset"):
        key = tuple(sorted(("base", variant)))
        assert key in got, f"base↔{variant} not found: {sorted(got)}"
        assert got[key]["frac_a"] >= 0.5 and got[key]["frac_b"] >= 0.5
    assert not any("noise" in k for k in got), sorted(got)
    # the 16-bit re-encode is pixel-faithful: every sampled frame matches
    # at distance 0
    key = tuple(sorted(("base", "reenc16")))
    assert got[key]["min_distance"] == 0
    assert got[key]["frac_a"] == 1.0 and got[key]["frac_b"] == 1.0


def test_video_banding_equals_brute(spark):
    """The banded frame-pair join reproduces the brute-force frame ball
    exactly (the hamming_pairs pigeonhole contract, re-pinned on the
    composite (clip, frame) id shape)."""
    from dbbspark.operators.phash import hamming_pairs_brute
    from dbbspark.operators.video import clip_fingerprints
    from pyspark.sql import functions as F

    clips = _variants()
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in clips.items()],
        "path string, content binary",
    )
    frames = clip_fingerprints(df, n_samples=6).select(
        F.struct(
            F.col("path").alias("cid"), F.col("fidx").alias("fidx")
        ).alias("_fid"),
        "fhash",
    ).localCheckpoint()
    from dbbspark.operators.phash import hamming_pairs

    banded = {
        ((r["id_a"]["cid"], r["id_a"]["fidx"]), (r["id_b"]["cid"], r["id_b"]["fidx"])): r["distance"]
        for r in hamming_pairs(frames, "_fid", "fhash", max_distance=5).collect()
    }
    brute = {
        ((r["id_a"]["cid"], r["id_a"]["fidx"]), (r["id_b"]["cid"], r["id_b"]["fidx"])): r["distance"]
        for r in hamming_pairs_brute(frames, "_fid", "fhash", max_distance=5).collect()
    }
    assert banded == brute and len(brute) > 0


def test_video_min_frac_validation(spark):
    from dbbspark.operators.video import video_near_dup

    df = spark.createDataFrame([("a", None)], "path string, content binary")
    with pytest.raises(ValueError, match="min_frac"):
        video_near_dup(df, min_frac=0.0)
    with pytest.raises(ValueError, match="n_samples"):
        video_near_dup(df, n_samples=0)


# --- degenerate-frame policy (VERDICT r9 item 1) ----------------------------


def _degen_corpus(spark, m, black_frames=1, n_noise=7, seed0=100):
    """m clips of unique noise frames plus ``black_frames`` planted
    solid-black frames each — the real-crawl pathology (every clip has
    a black frame; nothing else is shared)."""
    from dbbspark.sources.codecs import encode_pnm_seq

    rows = []
    for i in range(m):
        rng = np.random.default_rng(seed0 + i)
        frames = [
            rng.integers(0, 256, (24, 32)).astype(np.uint8)
            for _ in range(n_noise)
        ]
        frames += [np.zeros((24, 32), dtype=np.uint8)] * black_frames
        rows.append((f"c{i:03d}", bytearray(encode_pnm_seq(frames))))
    return spark.createDataFrame(rows, "path string, content binary")


def test_degenerate_stratum_candidate_volume_linear(spark):
    """M clips sharing ONE black frame: banding cost is linear always
    (representative routing — the black hash is one rep), and the
    candidate expansion is quadratic WITHOUT the variance policy but
    collapses to ~zero WITH it. This is the r9 'weak' flag pinned in
    numbers, not prose."""
    from dbbspark.operators.video import clip_fingerprints, score_clip_pairs
    from dbbspark.session import cut_lineage

    vols = {}
    for m in (8, 16):
        frames = cut_lineage(
            clip_fingerprints(_degen_corpus(spark, m), n_samples=8)
        )
        t_off, t_on = {}, {}
        score_clip_pairs(frames, telemetry=t_off).count()
        score_clip_pairs(
            frames, min_thumb_variance=25.0, telemetry=t_on
        ).count()
        # rep routing: distinct-hash banding never sees the stratum as a
        # hot bucket (the black hash is ONE rep row per band either way;
        # small constant buckets are chance 9-bit band collisions among
        # the unique noise hashes — what matters is no bucket ~ M)
        assert t_off["max_bucket"] <= 8
        # without the policy the shared black hash expands quadratically
        assert t_off["n_candidates"] >= m * (m - 1) // 2
        # with it the stratum contributes nothing (noise frames are
        # unique; allow a little slack for chance hash coincidences)
        assert t_on["n_candidates"] <= 3 * m
        vols[m] = (t_off["n_candidates"], t_on["n_candidates"])
    # doubling M quadruples the unmitigated volume but not the policy's
    off8, on8 = vols[8]
    off16, on16 = vols[16]
    assert off16 >= 3 * off8
    assert on16 <= 2 * on8 + 32


def test_degenerate_policy_unwelds_title_cards_keeps_true_dups(spark):
    """Two unrelated clips sharing two solid title cards weld at
    min_frac=0.25 without the policy and must NOT with it; a true
    re-encode (16-bit, pixel-faithful) still pairs at full fraction
    because the DENOMINATOR also drops the degenerate frames."""
    from dbbspark.operators.video import video_near_dup
    from dbbspark.sources.codecs import encode_pnm_seq

    title = np.full((24, 32), 128, dtype=np.uint8)

    def clip(seed):
        rng = np.random.default_rng(seed)
        return [title, title] + [
            rng.integers(0, 256, (24, 32)).astype(np.uint8) for _ in range(6)
        ]

    base = clip(1)
    df = spark.createDataFrame(
        [
            ("x", bytearray(encode_pnm_seq(base))),
            ("y", bytearray(encode_pnm_seq(clip(2)))),
            (
                "x16",
                bytearray(
                    encode_pnm_seq(
                        [(f.astype(np.uint16) * 257) for f in base],
                        maxval=65535,
                    )
                ),
            ),
        ],
        "path string, content binary",
    )
    welded = {
        (r["id_a"], r["id_b"])
        for r in video_near_dup(
            df, n_samples=8, min_frac=0.25
        ).collect()
    }
    assert ("x", "y") in welded  # the unmitigated title-card weld
    got = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dup(
            df, n_samples=8, min_frac=0.25, min_thumb_variance=25.0
        ).collect()
    }
    assert ("x", "y") not in got and ("x16", "y") not in got
    # true re-encode: 6 live frames all match → frac 1.0 of the LIVE count
    assert ("x", "x16") in got
    assert got[("x", "x16")]["frac_a"] == 1.0
    assert got[("x", "x16")]["frac_b"] == 1.0
    assert got[("x", "x16")]["min_distance"] == 0


def test_degenerate_clip_groups(spark):
    """All-degenerate clips (no frame above the variance threshold) get
    GROUP labels — all-black clips together, near-flat-gradient clips
    in their own group — while clips with any live frame get no row."""
    from dbbspark.operators.video import clip_fingerprints, degenerate_clip_groups
    from dbbspark.sources.codecs import encode_pnm_seq

    black = np.zeros((24, 32), dtype=np.uint8)
    # decreasing ramp: variance ~8 (degenerate) but a dHash far from 0
    ramp = np.tile(
        np.linspace(110, 100, 32).astype(np.uint8), (24, 1)
    )
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    rows = [
        ("b1", [black] * 6),
        ("b2", [black] * 6),
        ("b3", [black] * 6),
        ("r1", [ramp] * 6),
        ("r2", [ramp] * 6),
        ("live", [noise] * 6),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(encode_pnm_seq(fs))) for k, fs in rows],
        "path string, content binary",
    )
    frames = clip_fingerprints(df, n_samples=8).localCheckpoint()
    groups = {
        r["path"]: r["group"]
        for r in degenerate_clip_groups(
            frames, min_thumb_variance=25.0
        ).collect()
    }
    assert set(groups) == {"b1", "b2", "b3", "r1", "r2"}  # 'live' absent
    assert groups["b1"] == groups["b2"] == groups["b3"]
    assert groups["r1"] == groups["r2"]
    assert groups["b1"] != groups["r1"]
    # legacy relations without fvar refuse rather than silently no-op
    with pytest.raises(ValueError, match="fvar"):
        degenerate_clip_groups(frames.drop("fvar"), min_thumb_variance=25.0)


@pytest.mark.parametrize("kind", ["pnmseq", "y4m"])
def test_video_near_dup_end_to_end_by_kind(spark, kind):
    """The C57 pipeline end-to-end over BOTH registered clip codecs —
    the register_clip_extractor seam proven by two real containers
    (VERDICT r9 item 4): re-encode/resize/drop/offset found, noise not."""
    from dbbspark.operators.video import video_near_dup
    from dbbspark.sources.codecs import encode_pnm_seq, encode_y4m

    enc = encode_pnm_seq if kind == "pnmseq" else encode_y4m
    base = _clip(n=24)
    from dbbspark.sources.codecs import _nn_resize

    variants = {
        "base": enc(base),
        "resized": enc([_nn_resize(f, 72, 96) for f in base]),
        "dropped": enc([f for i, f in enumerate(base) if i % 3 != 2]),
        "offset": enc(base[3:]),
        "noise": enc(_clip(n=24, seed=7)),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in variants.items()],
        "path string, content binary",
    )
    pairs = video_near_dup(df, kind=kind, n_samples=8, min_frac=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for variant in ("resized", "dropped", "offset"):
        assert tuple(sorted(("base", variant))) in got, (kind, sorted(got))
    assert not any("noise" in k for k in got), (kind, sorted(got))


def test_cross_container_near_dup(spark):
    """The SAME clip shipped as pnmseq and as y4m fingerprints to the
    same frame hashes — fingerprint each container with its codec,
    union the frame relations, and the pair surfaces at distance 0:
    perceptual identity is container-independent."""
    from pyspark.sql import functions as F

    from dbbspark.operators.video import clip_fingerprints, score_clip_pairs
    from dbbspark.sources.codecs import encode_pnm_seq, encode_y4m

    base = _clip(n=24)
    pnm = spark.createDataFrame(
        [("clip.pnms", bytearray(encode_pnm_seq(base)))],
        "path string, content binary",
    )
    y4m = spark.createDataFrame(
        [("clip.y4m", bytearray(encode_y4m(base)))],
        "path string, content binary",
    )
    frames = clip_fingerprints(pnm, kind="pnmseq", n_samples=8).unionByName(
        clip_fingerprints(y4m, kind="y4m", n_samples=8)
    ).localCheckpoint()
    got = {
        (r["id_a"], r["id_b"]): r
        for r in score_clip_pairs(frames, min_frac=1.0).collect()
    }
    assert ("clip.pnms", "clip.y4m") in got
    assert got[("clip.pnms", "clip.y4m")]["min_distance"] == 0


def test_score_clip_pairs_plan_is_pure_jvm(spark):
    """Past the fingerprint crossing, scoring is DataFrame algebra only:
    no Python eval node anywhere in the plan (the rep-routed rewrite
    must not have smuggled a UDF in)."""
    frames = spark.createDataFrame(
        [("a", 8, 0, 1, 100.0), ("b", 8, 0, 1, 100.0)],
        "path string, n_sampled int, fidx int, fhash long, fvar double",
    )
    from dbbspark.operators.video import score_clip_pairs

    plan = score_clip_pairs(
        frames, min_thumb_variance=25.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

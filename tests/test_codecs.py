"""Real codecs through the multimodal seam (sources/codecs.py): genuine
PGM/PPM, FITS, and WAV bytes decoded end-to-end via decode_media /
sample_frames — the registered-decoder path, not the deterministic
fake."""

from __future__ import annotations

import numpy as np
import pytest

from dbbspark.sources.codecs import (
    WAV_WINDOW,
    decode_fits_image,
    decode_netpbm,
    encode_fits_image,
    encode_pgm,
    encode_ppm,
    encode_wav,
    wav_extract_frames,
    wav_frame_count,
)
from dbbspark.sources.multimodal import (
    decode_media,
    read_binary_docs,
    sample_frames,
)


def _write(tmp_path, name: str, payload: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(payload)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# unit: the decoders against real format bytes


def test_pgm_roundtrip():
    img = np.arange(128, dtype=np.uint8).reshape(8, 16)
    d = decode_netpbm(encode_pgm(img))
    assert (d["width"], d["height"], d["n_frames"]) == (16, 8, 1)
    assert d["feature"][0] == pytest.approx(img.mean())
    assert d["feature"][2] == 0.0 and d["feature"][3] == 127.0


def test_ppm_and_16bit_and_ascii():
    rgb = np.random.RandomState(7).randint(0, 256, (4, 5, 3)).astype(np.uint8)
    d = decode_netpbm(encode_ppm(rgb))
    assert (d["width"], d["height"]) == (5, 4)
    assert d["feature"][0] == pytest.approx(rgb.mean())
    # 16-bit binary PGM (big-endian samples per spec)
    wide = np.array([[0, 1000], [40000, 65535]], dtype=np.uint16)
    d16 = decode_netpbm(encode_pgm(wide, maxval=65535))
    assert d16["feature"][3] == 65535.0
    # ASCII P2 with a comment line
    ascii_pgm = b"P2\n# comment\n3 2\n255\n0 10 20\n30 40 50\n"
    d2 = decode_netpbm(ascii_pgm)
    assert (d2["width"], d2["height"]) == (3, 2)
    assert d2["feature"][0] == pytest.approx(25.0)


def test_netpbm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_netpbm(b"JFIF not a netpbm")
    with pytest.raises(ValueError):
        decode_netpbm(b"P5\n3 2\n")  # truncated header


def test_fits_roundtrip():
    img = (np.arange(24, dtype=np.int16) * 3).reshape(4, 6)
    d = decode_fits_image(encode_fits_image(img, bitpix=16))
    assert (d["width"], d["height"], d["n_frames"]) == (6, 4, 1)
    assert d["feature"][0] == pytest.approx(img.mean())
    assert d["feature"][3] == float(img.max())


def test_fits_bscale_bzero():
    # hand-build a header with scaling: physical = raw * 2 + 100
    raw_vals = np.array([[1, 2], [3, 4]], dtype=np.int16)
    payload = encode_fits_image(raw_vals, bitpix=16)
    hdr, data = payload[:2880], payload[2880:]
    cards = hdr.decode("ascii")
    end_at = cards.index("END")
    scaled = (
        cards[:end_at]
        + f"{'BSCALE':8s}= {2.0:>20.1f}".ljust(80)
        + f"{'BZERO':8s}= {100.0:>20.1f}".ljust(80)
        + "END".ljust(80)
    )
    scaled = scaled.ljust(2880 * ((len(scaled) + 2879) // 2880)).encode("ascii")
    d = decode_fits_image(scaled + data)
    assert d["feature"][2] == 102.0  # 1*2+100
    assert d["feature"][3] == 108.0  # 4*2+100


def test_wav_layout_and_windows():
    t = np.arange(WAV_WINDOW * 3, dtype=np.float64)
    samples = 0.5 * np.sin(2 * np.pi * 440 * t / 16000)
    wav = encode_wav(samples)
    assert wav_frame_count(wav) == 3
    feats = wav_extract_frames(wav, [0, 2])
    assert len(feats) == 2 and len(feats[0]) == 8
    # rms of a 0.5-amplitude sine ~ 0.5/sqrt(2)
    assert feats[0][0] == pytest.approx(0.5 / np.sqrt(2), rel=0.05)
    # silence tail window
    silent = encode_wav(np.zeros(WAV_WINDOW))
    assert wav_extract_frames(silent, [0])[0][0] == 0.0


# ---------------------------------------------------------------------------
# end-to-end: real files → binaryFile scan → Arrow-batched decode


def test_decode_media_real_pgm_files(spark, tmp_path):
    imgs = {
        f"grad{i}.pgm": (np.arange(64, dtype=np.uint8).reshape(8, 8) + i)
        for i in range(3)
    }
    for name, arr in imgs.items():
        _write(tmp_path, name, encode_pgm(arr))
    out = decode_media(
        read_binary_docs(spark, str(tmp_path), glob="*.pgm"), kind="pgm"
    ).select("path", "decoded")
    rows = {r["path"].rsplit("/", 1)[-1]: r["decoded"] for r in out.collect()}
    assert len(rows) == 3
    for name, arr in imgs.items():
        got = rows[name]
        assert (got["width"], got["height"]) == (8, 8)
        assert got["feature"][0] == pytest.approx(arr.mean())


def test_decode_media_real_fits_file(spark, tmp_path):
    img = np.linspace(0, 1, 30, dtype=np.float64).reshape(5, 6)
    _write(tmp_path, "obs.fits", encode_fits_image((img * 100).astype(np.int16)))
    got = (
        decode_media(
            read_binary_docs(spark, str(tmp_path), glob="*.fits"), kind="fits"
        )
        .select("decoded")
        .first()["decoded"]
    )
    assert (got["width"], got["height"]) == (6, 5)
    assert got["feature"][3] == 100.0


def test_sample_frames_real_wav(spark, tmp_path):
    # 8 windows; k=3 must pick first, middle, last — decoding only those
    n = WAV_WINDOW * 8
    samples = 0.25 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
    _write(tmp_path, "tone.wav", encode_wav(samples))
    frames = sample_frames(
        read_binary_docs(spark, str(tmp_path), glob="*.wav"),
        k=3,
        kind="wav",
    ).collect()
    assert sorted(r["frame_idx"] for r in frames) == [0, 4, 7]
    assert all(r["n_frames"] == 8 for r in frames)
    for r in frames:
        assert r["feature"][0] == pytest.approx(0.25 / np.sqrt(2), rel=0.05)


def test_malformed_bytes_yield_null_not_abort(spark, tmp_path):
    _write(tmp_path, "good.pgm", encode_pgm(np.zeros((2, 2), dtype=np.uint8)))
    _write(tmp_path, "bad.pgm", b"this is not an image at all")
    out = decode_media(
        read_binary_docs(spark, str(tmp_path), glob="*.pgm"), kind="pgm"
    ).select("path", "decoded")
    rows = {r["path"].rsplit("/", 1)[-1]: r["decoded"] for r in out.collect()}
    assert rows["bad.pgm"] is None  # quarantined, not fatal
    assert rows["good.pgm"]["width"] == 2


def test_codecs_register_lazily_in_fresh_interpreter(tmp_path):
    """Library users must get the real codecs WITHOUT importing
    sources.codecs themselves — decode_media loads them lazily. Needs a
    fresh interpreter (this test process has already imported codecs)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import sys; sys.path.insert(0, %r)
import numpy as np
from dbbspark.session import get_spark
from dbbspark.sources.multimodal import decode_media
arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
pgm = b"P5\\n4 4\\n255\\n" + arr.tobytes()
spark = get_spark("lazy-codec-probe", cpus=2)
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame([(1, bytearray(pgm))], "id long, content binary")
r = decode_media(df, kind="pgm").select("decoded").first()["decoded"]
assert (r["width"], r["height"]) == (4, 4), r
assert abs(r["feature"][0] - 7.5) < 1e-9
print("LAZY_OK")
""" % (repo,)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert "LAZY_OK" in out.stdout, out.stderr[-2000:]


# --- YUV4MPEG2 clip stream (the second registered clip codec) ---------------


def _y4m_frames(n=5, h=24, w=32, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


def test_y4m_count_without_decoding_rasters():
    """Frame count is pure header arithmetic: corrupting every raster
    byte (keeping the FRAME lines and sizes) must not change it."""
    import numpy as np

    from dbbspark.sources.codecs import encode_y4m, y4m_frame_count

    frames = _y4m_frames(7)
    raw = bytearray(encode_y4m(frames))
    assert y4m_frame_count(bytes(raw)) == 7
    # smash raster bytes only: walk the same arithmetic the codec uses
    hdr_end = raw.index(b"\n") + 1
    fb = 32 * 24 * 3 // 2
    pos = hdr_end
    for _ in range(7):
        nl = raw.index(b"\n", pos)
        raw[nl + 1 : nl + 1 + fb] = b"\xff" * fb
        pos = nl + 1 + fb
    assert y4m_frame_count(bytes(raw)) == 7


def test_y4m_selective_extract_equals_full():
    import numpy as np

    from dbbspark.sources.codecs import encode_y4m, y4m_extract_gray

    frames = _y4m_frames(6)
    for cs in ("420jpeg", "420", "422", "444", "mono"):
        raw = encode_y4m(frames, colorspace=cs)
        got = y4m_extract_gray(raw, [1, 4])
        assert np.array_equal(got[0], frames[1].astype(np.float64))
        assert np.array_equal(got[1], frames[4].astype(np.float64))
    # duplicate + unordered requests honor the request order
    raw = encode_y4m(frames)
    got = y4m_extract_gray(raw, [4, 0, 4])
    assert np.array_equal(got[0], got[2])
    assert np.array_equal(got[1], frames[0].astype(np.float64))


def test_y4m_frame_params_and_defaults():
    """FRAME lines may carry parameters; a stream header without C
    defaults to 420jpeg — both per the public spec."""
    import numpy as np

    from dbbspark.sources.codecs import y4m_extract_gray, y4m_frame_count

    f = np.arange(24 * 32, dtype=np.uint8).reshape(24, 32)
    chroma = bytes([128]) * (2 * (16 * 12))
    raw = (
        b"YUV4MPEG2 W32 H24 F30000:1001 Ip A128:117\n"
        + b"FRAME Xcustom\n" + f.tobytes() + chroma
        + b"FRAME\n" + f.tobytes() + chroma
    )
    assert y4m_frame_count(raw) == 2
    assert np.array_equal(
        y4m_extract_gray(raw, [1])[0], f.astype(np.float64)
    )


def test_y4m_malformed_raise():
    import numpy as np
    import pytest

    from dbbspark.sources.codecs import (
        encode_y4m,
        y4m_extract_gray,
        y4m_frame_count,
    )

    frames = _y4m_frames(3)
    good = encode_y4m(frames)
    with pytest.raises(ValueError, match="magic"):
        y4m_frame_count(b"JUNK" + good)
    with pytest.raises(ValueError, match="W/H"):
        y4m_frame_count(b"YUV4MPEG2 F25:1\nFRAME\n")
    with pytest.raises(ValueError, match="colorspace"):
        y4m_frame_count(b"YUV4MPEG2 W2 H2 C999\nFRAME\n" + b"\0" * 16)
    with pytest.raises(ValueError, match="truncated"):
        y4m_frame_count(good[:-5])
    with pytest.raises(ValueError, match="FRAME"):
        y4m_frame_count(good[: good.index(b"\n") + 1] + b"XRAME\n")
    with pytest.raises(IndexError, match="out of range"):
        y4m_extract_gray(good, [99])
    with pytest.raises(ValueError, match="empty"):
        y4m_frame_count(b"YUV4MPEG2 W32 H24\n")

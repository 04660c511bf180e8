"""Resize leg of the multimodal seam (sources/codecs.py resize_*,
sources/multimodal.py resize_media; SURVEY.md §2.11 C5)."""

from __future__ import annotations

import numpy as np

from dbbspark.sources.codecs import (
    _netpbm_array,
    _nn_resize,
    decode_fits_image,
    encode_fits_image,
    encode_pgm,
    encode_ppm,
    resize_fits,
    resize_netpbm,
)
from dbbspark.sources.multimodal import decode_media, resize_media


def _grad(h, w):
    return (np.arange(h)[:, None] * w + np.arange(w)[None, :]).astype(np.uint8)


def test_nn_resize_reference():
    a = _grad(8, 8)
    out = _nn_resize(a, 4, 4)
    ys = np.clip(((np.arange(4) + 0.5) * 2).astype(int), 0, 7)
    assert (out == a[ys][:, ys]).all()
    # identity resize is exact
    assert (_nn_resize(a, 8, 8) == a).all()


def test_resize_pgm_values_and_format():
    a = _grad(8, 8)
    out = resize_netpbm(encode_pgm(a), 4, 4)
    assert out[:2] == b"P5"
    data, w, h, ch, maxval = _netpbm_array(out)
    assert (w, h, ch, maxval) == (4, 4, 1, 255)
    assert (np.asarray(data).reshape(4, 4) == _nn_resize(a, 4, 4)).all()


def test_resize_ppm_color_and_upscale():
    rgb = np.dstack([_grad(4, 4)] * 3)
    out = resize_netpbm(encode_ppm(rgb), 8, 8)
    assert out[:2] == b"P6"
    data, w, h, ch, _ = _netpbm_array(out)
    assert (w, h, ch) == (8, 8, 3)
    assert (
        np.asarray(data).reshape(8, 8, 3) == _nn_resize(rgb, 8, 8)
    ).all()


def test_resize_ascii_pgm_reencodes_binary_lossless():
    a = _grad(6, 6)
    ascii_pgm = (
        b"P2\n6 6\n255\n" + " ".join(str(v) for v in a.ravel()).encode()
    )
    out = resize_netpbm(ascii_pgm, 3, 3)
    data, w, h, _, _ = _netpbm_array(out)
    assert (np.asarray(data).reshape(3, 3) == _nn_resize(a, 3, 3)).all()


def test_resize_fits_preserves_bitpix():
    a = (np.arange(64).reshape(8, 8) * 100).astype(np.int16)
    raw = encode_fits_image(a, bitpix=16)
    out = resize_fits(raw, 4, 4)
    dec = decode_fits_image(out)
    assert (dec["width"], dec["height"]) == (4, 4)
    # re-decode the data unit and compare against the nn reference
    out2 = resize_fits(out, 4, 4)  # idempotent at same size
    assert out2 == out


def test_resize_media_seam(spark):
    rows = [
        (1, bytearray(encode_pgm(_grad(8, 8)))),
        (2, bytearray(b"not an image")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r["resized"] for r in resize_media(df, 4, 4, kind="pgm").collect()}
    assert got[1] is not None and (got[1]["width"], got[1]["height"]) == (4, 4)
    assert got[2] is None and got[3] is None
    # the resized bytes are a real PGM: decode them back through the seam
    rdf = spark.createDataFrame(
        [(1, bytearray(got[1]["content"]))], "doc_id long, content binary"
    )
    [dec] = decode_media(rdf, kind="pgm").collect()
    assert (dec["decoded"]["width"], dec["decoded"]["height"]) == (4, 4)


def test_unregistered_kind_yields_null(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"whatever"))], "doc_id long, content binary"
    )
    [r] = resize_media(df, 4, 4, kind="no-such-format").collect()
    assert r["resized"] is None

"""Baseline JPEG codec (kernel/jpegcodec.py): real Huffman + IDCT decode,
spec-valid encode, and the magic-dispatched Spark operator built on it."""

import numpy as np
import pytest

from wpextract_spark.kernel.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)
from wpextract_spark.sources.imagegen import (
    build_gradient_image,
    build_gif_gradient,
    build_gradient_jpeg,
    build_jpeg,
    build_jpeg_gradient,
)


def _block_gradient(w, h, base):
    return np.fromfunction(
        lambda r, c: (base + r // 8 + c // 8) % 256, (h, w)
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "w,h,base",
    [(8, 8, 0), (16, 16, 255), (20, 36, 37), (9, 17, 128), (116, 109, 200)],
)
def test_block_constant_roundtrip_exact(w, h, base):
    """Pixels constant per 8x8 block => DC-only spectrum => bit-exact."""
    px = _block_gradient(w, h, base)
    out = decode_jpeg(encode_jpeg_gray(px))
    assert out is not None
    width, height, channels, data = out
    assert (width, height, channels) == (w, h, 1)
    assert np.array_equal(np.frombuffer(data, np.uint8).reshape(h, w), px)


def test_arbitrary_gray_near_lossless():
    """All-ones quant table: error bounded by DCT/IDCT rounding only."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    w, h, c, data = decode_jpeg(encode_jpeg_gray(px))
    err = np.abs(
        np.frombuffer(data, np.uint8).reshape(40, 56).astype(int)
        - px.astype(int)
    ).max()
    assert err <= 2


def test_color_420_subsampling():
    """2x2-subsampled chroma at 128 decodes to gray RGB == Y exactly."""
    y = _block_gradient(32, 24, 10)
    flat = np.full((12, 16), 128, np.uint8)
    w, h, c, data = decode_jpeg(
        encode_jpeg([y, flat, flat], [(2, 2), (1, 1), (1, 1)])
    )
    assert (w, h, c) == (32, 24, 3)
    rgb = np.frombuffer(data, np.uint8).reshape(24, 32, 3)
    for ch in range(3):
        assert np.array_equal(rgb[:, :, ch], y)


def test_color_444():
    y = _block_gradient(16, 16, 77)
    flat = np.full((16, 16), 128, np.uint8)
    w, h, c, data = decode_jpeg(encode_jpeg([y, flat, flat]))
    assert (w, h, c) == (16, 16, 3)
    rgb = np.frombuffer(data, np.uint8).reshape(16, 16, 3)
    assert np.array_equal(rgb[:, :, 0], y)


@pytest.mark.parametrize("interval", [1, 2, 3, 7])
def test_restart_markers(interval):
    """DRI/RSTn: DC predictors reset and the bit reader re-aligns."""
    px = _block_gradient(40, 24, 90)
    out = decode_jpeg(encode_jpeg([px], restart_interval=interval))
    assert out is not None
    w, h, c, data = out
    assert np.array_equal(np.frombuffer(data, np.uint8).reshape(24, 40), px)


def test_ac_coefficients_survive():
    """A non-constant block exercises the AC run-length path (ZRL/EOB)."""
    px = np.zeros((8, 8), np.uint8)
    px[0, 0] = 255  # sharp impulse: dense AC spectrum
    w, h, c, data = decode_jpeg(encode_jpeg_gray(px))
    dec = np.frombuffer(data, np.uint8).reshape(8, 8).astype(int)
    assert abs(dec[0, 0] - 255) <= 2
    assert np.abs(dec - px.astype(int)).max() <= 2


def test_quarantine_contract():
    """Garbage, truncation, foreign formats, unsupported modes -> None."""
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8junk") is None
    assert decode_jpeg(build_jpeg(64, 64)) is None  # stub entropy stream
    assert decode_jpeg(build_gradient_image(5)[3]) is None  # a PNG
    good = build_jpeg_gradient(24, 24, 50)
    assert decode_jpeg(good[: len(good) // 2]) is None  # truncated scan
    # progressive marker (SOF2) is rejected, not misparsed
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None


def test_generator_matches_decode():
    for doc_id in (0, 1, 17, 99, 12345):
        w, h, base, payload = build_gradient_jpeg(doc_id)
        assert w == 16 + doc_id % 100 and h == 16 + (doc_id * 7) % 100
        width, height, channels, data = decode_jpeg(payload)
        assert (width, height, channels) == (w, h, 1)
        expected = _block_gradient(w, h, base)
        assert np.array_equal(
            np.frombuffer(data, np.uint8).reshape(h, w), expected
        )


def test_image_pixel_stats_dispatches_all_three(spark):
    """One frame mixing PNG, GIF, and JPEG payloads: the magic dispatch
    routes each to its codec; the stub-stream JPEG quarantines to nulls."""
    from wpextract_spark.operators.multimodal import image_pixel_stats

    rows = [
        (1, "png", bytearray(build_gradient_image(4)[3])),
        (2, "gif", bytearray(build_gif_gradient(10, 6, 3))),
        (3, "jpeg", bytearray(build_gradient_jpeg(4)[3])),
        (4, "jpeg", bytearray(build_jpeg(32, 32))),  # header-only stub
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r for r in image_pixel_stats(media).collect()}
    w, h, base, _ = build_gradient_image(4)
    assert got[1]["pixel_sum"] == int(
        sum((base + r + c) % 256 for r in range(h) for c in range(w))
    )
    assert got[2]["pixel_sum"] == 3 * sum(
        (3 + r + c) % 256 for r in range(6) for c in range(10)
    )
    jw, jh, jbase, _ = build_gradient_jpeg(4)
    assert got[3]["width"] == jw and got[3]["height"] == jh
    assert got[3]["pixel_sum"] == int(_block_gradient(jw, jh, jbase).sum())
    assert got[4]["pixel_sum"] is None and got[4]["width"] is None

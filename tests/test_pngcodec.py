"""PNG pixel codec (kernel/pngcodec.py): real decode — zlib inflate +
unfilter — and the Spark operators built on it."""

import struct
import zlib

import numpy as np
import pytest

from wpextract_spark.kernel.pngcodec import (
    decode_png,
    encode_png,
    pixel_stats,
    resize_nearest,
)
from wpextract_spark.sources.imagegen import (
    _png_chunk,
    build_gif,
    build_gradient_image,
    build_png,
    build_png_gradient,
)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_and_channel_count(channels, filt):
    rng = np.random.RandomState(7 * channels + filt)
    w, h = 13, 9
    px = rng.randint(0, 256, size=(h, w * channels), dtype=np.uint8).tobytes()
    payload = encode_png(w, h, px, channels, row_filters=[filt] * h)
    assert decode_png(payload) == (w, h, channels, px)


def test_mixed_filters_roundtrip():
    rng = np.random.RandomState(3)
    w, h = 8, 10
    px = rng.randint(0, 256, size=(h, w * 3), dtype=np.uint8).tobytes()
    filters = [r % 5 for r in range(h)]
    assert decode_png(encode_png(w, h, px, 3, row_filters=filters)) == (w, h, 3, px)


def test_gradient_matches_generator_arithmetic():
    for doc_id in (0, 1, 17, 254, 999):
        w, h, base, payload = build_gradient_image(doc_id)
        gw, gh, gc, px = decode_png(payload)
        assert (gw, gh, gc) == (w, h, 1)
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
        r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        expected = (base + r + c) % 256
        assert (arr == expected).all()
        assert pixel_stats(payload) == (w, h, 1, w * h, int(expected.sum()))


def test_flat_png_and_quarantine_inputs():
    w, h = 20, 7
    assert decode_png(build_png(w, h, gray=0x42)) == (w, h, 1, bytes([0x42]) * (w * h))
    # Non-PNG, garbage, truncation, and None never raise — they return None.
    assert decode_png(build_gif(5, 5)) is None
    assert decode_png(b"garbage") is None
    assert decode_png(build_png(5, 5)[:30]) is None
    assert decode_png(None) is None
    assert pixel_stats(None) is None
    # Corrupt IDAT (bad zlib stream) quarantines too.
    good = build_png(5, 5)
    bad = bytearray(good)
    bad[41] ^= 0xFF
    assert decode_png(bytes(bad)) is None


def test_palette_png_expands_to_rgb():
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00\x00\x01\x02" + b"\x00\x02\x01\x00"
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(payload)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_resize_nearest_exact_index_map():
    payload = build_png_gradient(16, 16, 10)
    resized = resize_nearest(payload, 4, 8)
    rw, rh, rc, rpx = decode_png(resized)
    assert (rw, rh, rc) == (4, 8, 1)
    orig = np.frombuffer(decode_png(payload)[3], dtype=np.uint8).reshape(16, 16)
    expected = orig[(np.arange(8) * 16) // 8][:, (np.arange(4) * 16) // 4]
    assert (np.frombuffer(rpx, dtype=np.uint8).reshape(8, 4) == expected).all()
    assert resize_nearest(b"not a png", 4, 4) is None
    assert resize_nearest(payload, 0, 4) is None


def test_png_pixel_stats_operator(spark):
    """Distributed path: decode runs inside mapInPandas; corrupt rows yield
    nulls instead of killing the task."""
    from pyspark.sql import functions as F

    from wpextract_spark.operators.multimodal import (
        gradient_image_build_udf,
        png_pixel_stats,
    )

    media = (
        spark.range(6)
        .select(
            F.col("id").alias("media_id"),
            F.lit("png").alias("kind"),
            gradient_image_build_udf()(F.col("id")).alias("payload"),
        )
    )
    corrupt = spark.createDataFrame(
        [(99, "png", b"not a png")], "media_id long, kind string, payload binary"
    )
    rows = {r["media_id"]: r for r in png_pixel_stats(media.union(corrupt)).collect()}
    for doc_id in range(6):
        w, h, base, payload = build_gradient_image(doc_id)
        expected = pixel_stats(payload)
        row = rows[doc_id]
        got = (row["width"], row["height"], row["channels"], row["n_pixels"], row["pixel_sum"])
        assert got == expected
    assert rows[99]["pixel_sum"] is None and rows[99]["width"] is None


def test_png_resize_operator(spark):
    from pyspark.sql import functions as F

    from wpextract_spark.operators.multimodal import (
        gradient_image_build_udf,
        png_resize,
    )

    media = spark.range(3).select(
        F.col("id").alias("media_id"),
        F.lit("png").alias("kind"),
        gradient_image_build_udf()(F.col("id")).alias("payload"),
    )
    rows = {r["media_id"]: r for r in png_resize(media, 8, 8).collect()}
    for doc_id in range(3):
        _, _, _, payload = build_gradient_image(doc_id)
        assert bytes(rows[doc_id]["payload"]) == resize_nearest(payload, 8, 8)
        decoded = decode_png(bytes(rows[doc_id]["payload"]))
        assert decoded[:3] == (8, 8, 1)

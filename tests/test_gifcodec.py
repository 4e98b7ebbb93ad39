"""GIF pixel codec (kernel/gifcodec.py): real LZW decode of the first
frame, and the magic-dispatched image_pixel_stats operator."""

import numpy as np
import pytest

from wpextract_spark.kernel.gifcodec import _lzw_decode, decode_gif
from wpextract_spark.sources.imagegen import (
    _lzw_uncompressed,
    build_gif,
    build_gif_gradient,
    build_png_gradient,
)


@pytest.mark.parametrize("w,h,base", [(16, 16, 0), (23, 17, 100), (1, 1, 255), (300, 5, 7)])
def test_gradient_gif_roundtrip(w, h, base):
    gw, gh, gc, px = decode_gif(build_gif_gradient(w, h, base))
    assert (gw, gh, gc) == (w, h, 3)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    expected = (base + r + c) % 256
    for chan in range(3):  # gray palette: all channels equal the index
        assert (arr[:, :, chan] == expected).all()


def test_lzw_decoder_handles_dictionary_growth():
    """The generator emits uncompressed-form LZW, but the decoder must
    handle real dictionary growth including the KwKwK case — feed it a
    hand-built compressed stream."""
    # min_code_size 2: clear=4, eoi=5. Codes: clear, 1, 1 -> KwKwK at code 6
    # would be exercised by (clear, 1, 6): 6 == next_code -> '11'.
    def pack(codes, width):
        bitbuf = bitcnt = 0
        out = bytearray()
        for c in codes:
            bitbuf |= c << bitcnt
            bitcnt += width
            while bitcnt >= 8:
                out.append(bitbuf & 0xFF)
                bitbuf >>= 8
                bitcnt -= 8
        if bitcnt:
            out.append(bitbuf & 0xFF)
        return bytes(out)

    data = pack([4, 1, 6, 5], 3)  # clear, '1', KwKwK '11', eoi
    assert _lzw_decode(data, 2, 3) == bytes([1, 1, 1])


def test_lzw_uncompressed_respects_width_cycles():
    # 600 indices at min_code_size 2 forces many CLEAR cycles (max 2
    # literals per cycle); decode must invert exactly.
    indices = bytes(i % 4 for i in range(600))
    stream = _lzw_uncompressed(indices, min_code_size=2)
    assert _lzw_decode(stream, 2, 600) == indices


def test_quarantine_inputs():
    assert decode_gif(None) is None
    assert decode_gif(b"junk") is None
    assert decode_gif(b"GIF89a123") is None
    assert decode_gif(build_gif(5, 5)) is None  # metadata stub: short stream
    good = build_gif_gradient(8, 8, 3)
    assert decode_gif(good[:30]) is None  # truncated
    assert decode_gif(build_png_gradient(8, 8, 3)) is None  # wrong magic


def test_image_pixel_stats_dispatches_png_and_gif(spark):
    from pyspark.sql import functions as F

    from wpextract_spark.operators.multimodal import image_pixel_stats

    rows_in = [
        (1, "png", build_png_gradient(10, 6, 7)),
        (2, "gif", build_gif_gradient(10, 6, 7)),
        (3, "jpeg", b"\xff\xd8\xff\xe0 not decodable"),
    ]
    media = spark.createDataFrame(
        rows_in, "media_id long, kind string, payload binary"
    )
    got = {r["media_id"]: r for r in image_pixel_stats(media).collect()}
    r_, c_ = np.meshgrid(np.arange(6), np.arange(10), indexing="ij")
    gray_sum = int(((7 + r_ + c_) % 256).sum())
    assert (got[1]["channels"], got[1]["pixel_sum"]) == (1, gray_sum)
    # same pixels, palette-expanded to 3 identical channels
    assert (got[2]["channels"], got[2]["pixel_sum"]) == (3, gray_sum * 3)
    assert got[1]["n_pixels"] == got[2]["n_pixels"] == 60
    assert got[3]["pixel_sum"] is None

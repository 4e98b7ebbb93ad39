"""Image metadata sniffing: generator <-> sniffer roundtrip, edge cases, and
the Spark image_metadata operator."""

import struct
import zlib

import pytest

from wpextract_spark.kernel.imagemeta import sniff_image
from wpextract_spark.sources.imagegen import (
    build_gif,
    build_image,
    build_jpeg,
    build_png,
)


@pytest.mark.parametrize("w,h", [(1, 1), (16, 23), (640, 480), (65535, 3)])
def test_png_roundtrip(w, h):
    assert sniff_image(build_png(w, h)) == ("image/png", w, h)


@pytest.mark.parametrize("w,h", [(1, 1), (320, 200), (65535, 65535)])
def test_gif_roundtrip(w, h):
    assert sniff_image(build_gif(w, h)) == ("image/gif", w, h)


@pytest.mark.parametrize("w,h", [(1, 1), (1920, 1080), (16, 115)])
def test_jpeg_roundtrip(w, h):
    assert sniff_image(build_jpeg(w, h)) == ("image/jpeg", w, h)


def test_png_is_spec_valid():
    """The generated PNG is a complete file: correct chunk CRCs and an IDAT
    that inflates to exactly height * (1 + width) filter+pixel bytes."""
    payload = build_png(20, 7)
    pos = 8
    seen = []
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        kind = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(kind + body) & 0xFFFFFFFF
        seen.append(kind)
        if kind == b"IDAT":
            assert len(zlib.decompress(body)) == 7 * (1 + 20)
        pos += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_jpeg_sniff_skips_leading_segments():
    """SOFn found after APP0/COM segments of arbitrary length."""
    comment = b"\xff\xfe" + struct.pack(">H", 12) + b"0123456789"
    payload = build_jpeg(300, 200)
    with_comment = payload[:2] + comment + payload[2:]
    assert sniff_image(with_comment) == ("image/jpeg", 300, 200)


def test_sniff_never_raises_on_garbage():
    cases = [
        None,
        b"",
        b"\x89PNG\r\n\x1a\n",  # truncated before IHDR
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 20,  # wrong first chunk
        b"GIF89a\x01",  # truncated descriptor
        b"\xff\xd8\xff",  # truncated JPEG
        b"\xff\xd8" + b"\x00" * 50,  # desynchronized JPEG
        b"<html>not an image</html>",
        build_png(5, 5)[:20],
    ]
    for payload in cases:
        assert sniff_image(payload) is None


def test_build_image_rotation():
    kinds = [build_image(i)[0] for i in range(6)]
    assert kinds == ["png", "gif", "jpeg", "png", "gif", "jpeg"]
    for i in (0, 1, 2, 77, 123):
        kind, w, h, payload = build_image(i)
        assert (w, h) == (16 + i % 100, 16 + (i * 7) % 100)
        mime, sw, sh = sniff_image(payload)
        assert (sw, sh) == (w, h) and mime.endswith(kind)


def test_image_metadata_operator(spark):
    from pyspark.sql import functions as F

    from wpextract_spark.operators.multimodal import image_build_udf, image_metadata

    df = spark.range(9).select(
        F.col("id").alias("media_id"),
        F.lit("img").alias("kind"),
        image_build_udf()(F.col("id")).alias("payload"),
    )
    # One corrupt row: payload not an image -> nulls, task survives.
    corrupt = spark.createDataFrame(
        [(99, "img", b"not an image at all")], "media_id long, kind string, payload binary"
    )
    rows = {r["media_id"]: r for r in image_metadata(df.union(corrupt)).collect()}
    assert rows[0]["mime"] == "image/png" and rows[0]["width"] == 16
    assert rows[1]["mime"] == "image/gif"
    assert rows[2]["mime"] == "image/jpeg"
    assert rows[4]["height"] == 16 + 28
    assert rows[99]["mime"] is None and rows[99]["width"] is None


def test_wav_roundtrip():
    from wpextract_spark.kernel.audiometa import sniff_wav
    from wpextract_spark.sources.audiogen import build_audio, build_wav

    assert sniff_wav(build_wav(8000, 16000)) == ("audio/wav", 16000, 1, 8000, 0.5)
    for i in (0, 3, 123):
        rate, n, payload = build_audio(i)
        mime, sr, ch, ns, dur = sniff_wav(payload)
        assert (sr, ch, ns) == (rate, 1, n)
        assert dur == n / rate


def test_wav_sniff_never_raises():
    from wpextract_spark.kernel.audiometa import sniff_wav

    cases = [None, b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE",
             b"RIFF\x10\x00\x00\x00WAVEfmt ", b"<html>no</html>",
             b"RIFF\xff\xff\xff\xffWAVEdata\xff\xff\xff\xff"]
    for payload in cases:
        assert sniff_wav(payload) is None


def test_wav_sniff_skips_extra_chunks():
    """fmt/data found after a LIST metadata chunk (word-aligned walk)."""
    import struct

    from wpextract_spark.kernel.audiometa import sniff_wav
    from wpextract_spark.sources.audiogen import build_wav

    wav = build_wav(100, 8000)
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx\x00"  # odd size, padded
    patched = wav[:12] + info + wav[12:]
    assert sniff_wav(patched) == ("audio/wav", 8000, 1, 100, 100 / 8000)

"""MJPEG-AVI container codec (kernel/avicodec.py): RIFF chunk-tree parse,
frame sampling, per-frame JPEG decode, and the Spark operators on top."""

import struct

import numpy as np
import pytest

from wpextract_spark.kernel.avicodec import avi_frames, build_avi_mjpeg, parse_avi
from wpextract_spark.kernel.jpegcodec import decode_jpeg, encode_jpeg_gray
from wpextract_spark.sources.videogen import build_gradient_video


def _frames(w, h, n):
    out = []
    for f in range(n):
        px = np.fromfunction(
            lambda r, c: (f * 11 + r // 8 + c // 8) % 256, (h, w)
        ).astype(np.uint8)
        out.append(encode_jpeg_gray(px))
    return out


def test_container_roundtrip_metadata():
    avi = build_avi_mjpeg(_frames(24, 16, 5), 24, 16, fps=5)
    meta = parse_avi(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (24, 16, 5)
    assert meta["fps"] == 5.0 and meta["duration_s"] == 1.0
    assert len(meta["frames"]) == 5


@pytest.mark.parametrize("every_n", [1, 2, 3])
def test_frame_sampling_and_decode_exact(every_n):
    w, h, n = 40, 24, 6
    avi = build_avi_mjpeg(_frames(w, h, n), w, h)
    frames = avi_frames(avi, every_n=every_n)
    assert len(frames) == len(range(0, n, every_n))
    for i, fb in enumerate(frames):
        width, height, channels, data = decode_jpeg(fb)
        assert (width, height, channels) == (w, h, 1)
        expect = np.fromfunction(
            lambda r, c: ((i * every_n) * 11 + r // 8 + c // 8) % 256, (h, w)
        ).astype(np.uint8)
        assert np.array_equal(np.frombuffer(data, np.uint8).reshape(h, w), expect)


def test_odd_frame_sizes_stay_word_aligned():
    """A frame with odd byte length forces the RIFF pad-byte path; the
    chunk walk must skip the pad and return exact frame bytes."""
    frames = [b"ODD", b"EVEN", b"5byte"]
    avi = build_avi_mjpeg(frames, 8, 8)
    assert avi_frames(avi) == frames


def test_quarantine_contract():
    assert parse_avi(None) is None
    assert parse_avi(b"") is None
    assert parse_avi(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert parse_avi(b"garbage bytes everywhere") is None
    good = build_avi_mjpeg(_frames(16, 16, 2), 16, 16)
    assert parse_avi(good[:40]) is None  # truncated past header
    # zero-dimension header quarantines
    zero = good.replace(struct.pack("<II", 16, 16), struct.pack("<II", 0, 0))
    assert parse_avi(zero) is None


def test_generator_matches_decode():
    for doc_id in (0, 3, 17, 99):
        w, h, n, payload = build_gradient_video(doc_id)
        meta = parse_avi(payload)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, n)
        base = (doc_id * 37) % 256
        fb = avi_frames(payload)[n - 1]
        width, height, _c, data = decode_jpeg(fb)
        expect = np.fromfunction(
            lambda r, c: (base + (n - 1) * 11 + r // 8 + c // 8) % 256, (h, w)
        ).astype(np.uint8)
        assert np.array_equal(np.frombuffer(data, np.uint8).reshape(h, w), expect)


def test_video_operators(spark):
    from wpextract_spark.operators.multimodal import (
        gradient_video_build_udf,
        video_frame_stats,
        video_metadata,
    )
    from pyspark.sql import functions as F

    media = spark.range(6).select(
        F.col("id").alias("media_id"),
        F.lit("video").alias("kind"),
        gradient_video_build_udf()(F.col("id")).alias("payload"),
    )
    meta = {r["media_id"]: r for r in video_metadata(media).collect()}
    for i in range(6):
        assert meta[i]["mime"] == "video/x-msvideo"
        assert meta[i]["n_frames"] == 2 + i % 6
        assert meta[i]["width"] == 16 + i % 48

    stats = video_frame_stats(media, every_n=2).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r for r in stats}
    for i in range(6):
        w, h, n, _ = build_gradient_video(i)
        base = (i * 37) % 256
        for f in range(0, n, 2):
            row = by_key[(i, f)]
            expect = np.fromfunction(
                lambda r, c: (base + f * 11 + r // 8 + c // 8) % 256, (h, w)
            ).astype(np.uint8)
            assert row["pixel_sum"] == int(expect.sum())
    # corrupt payload yields no rows, kills nothing
    junk = spark.createDataFrame(
        [(99, "video", bytearray(b"not an avi"))],
        "media_id long, kind string, payload binary",
    )
    assert video_frame_stats(junk).count() == 0

"""Raw MJPEG stream codec: marker-walk frame split, roundtrip exactness,
adversarial embedded-marker payloads, and quarantine totality — the
second-container proof for the video decode seam (kernel/avicodec.py is
the first)."""

import pytest

from wpextract_spark.kernel.jpegcodec import decode_jpeg
from wpextract_spark.kernel.mjpegcodec import (
    build_mjpeg_stream,
    mjpeg_frames,
    split_mjpeg,
)
from wpextract_spark.sources.imagegen import build_jpeg_gradient
from wpextract_spark.sources.videogen import (
    build_gradient_mjpeg_stream,
    build_gradient_video,
)


def _frames(n=4, w=24, h=16, base=7):
    return [build_jpeg_gradient(w, h, (base + f * 11) % 256) for f in range(n)]


def test_roundtrip_exact_bytes():
    frames = _frames(5)
    stream = build_mjpeg_stream(frames)
    assert mjpeg_frames(stream) == frames  # byte-identical frames back
    spans = split_mjpeg(stream)
    assert [s for _, s in spans] == [len(f) for f in frames]
    assert spans[0][0] == 0 and spans[-1][0] + spans[-1][1] == len(stream)


def test_every_n_sampling():
    frames = _frames(6)
    stream = build_mjpeg_stream(frames)
    assert mjpeg_frames(stream, every_n=2) == frames[::2]
    assert mjpeg_frames(stream, every_n=5) == frames[::5]


def test_single_frame_stream_decodes():
    (frame,) = _frames(1)
    got = mjpeg_frames(build_mjpeg_stream([frame]))
    assert got == [frame]
    assert decode_jpeg(got[0]) is not None


def test_embedded_eoi_in_comment_segment_not_a_boundary():
    # A COM segment whose payload contains FFD8/FFD9 byte pairs (EXIF
    # thumbnails do this in the wild): a naive FFD9 scan would cut the
    # frame early; the marker walk must not.
    f1, f2 = _frames(2)
    body = b"\xff\xd9\xff\xd8junk\xff\xd9"
    com = b"\xff\xfe" + (len(body) + 2).to_bytes(2, "big") + body
    poisoned = f1[:2] + com + f1[2:]  # COM right after SOI
    stream = build_mjpeg_stream([poisoned, f2])
    got = mjpeg_frames(stream)
    assert got == [poisoned, f2]
    assert decode_jpeg(got[0]) is not None  # still a valid JPEG


def test_quarantine_totality():
    frames = _frames(2)
    stream = build_mjpeg_stream(frames)
    assert split_mjpeg(b"") is None
    assert split_mjpeg(None) is None
    assert split_mjpeg(b"\x00" * 64) is None  # not a JPEG at offset 0
    assert split_mjpeg(stream[:-1]) is None  # truncated final frame
    assert split_mjpeg(stream[1:]) is None  # leading garbage
    assert split_mjpeg(stream + b"tail") is None  # trailing junk
    # builder refuses non-JPEG members
    with pytest.raises(ValueError):
        build_mjpeg_stream([b"\xff\xd8 no eoi"])


def test_generator_matches_avi_arithmetic():
    # Same (width, height, n_frames) and byte-identical frames as the AVI
    # generator for the same doc id — one SQL oracle covers both wrappers.
    for doc_id in (0, 3, 17):
        w_a, h_a, n_a, avi = build_gradient_video(doc_id)
        w_m, h_m, n_m, stream = build_gradient_mjpeg_stream(doc_id)
        assert (w_a, h_a, n_a) == (w_m, h_m, n_m)
        from wpextract_spark.kernel.avicodec import avi_frames

        assert avi_frames(avi) == mjpeg_frames(stream)


def test_spark_operator_over_mjpeg_stream(spark):
    from pyspark.sql import functions as F

    from wpextract_spark.operators.multimodal import (
        gradient_mjpeg_stream_build_udf,
        video_frame_stats,
    )

    media = spark.range(4).select(
        F.col("id").alias("media_id"),
        gradient_mjpeg_stream_build_udf()(F.col("id")).alias("payload"),
    )
    rows = video_frame_stats(media, every_n=2, container="mjpeg").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # n_frames = 2 + id % 6; sampled indices 0, 2, ... < n_frames
    for media_id in range(4):
        n = 2 + media_id % 6
        assert sorted(by_id[media_id]) == list(range(0, n, 2))
    with pytest.raises(ValueError):
        video_frame_stats(media, container="mp4")

"""Deterministic generator of minimal MJPEG-AVI video payloads.

Synthesizes crawl-style binary video columns for tests/benchmarks (sandbox
rule: no external data). Output is a complete, spec-valid RIFF/AVI file —
real players open it — whose frames are block-gradient baseline JPEGs
(``sources/imagegen.build_jpeg_gradient`` arithmetic, shifted per frame),
so decoded per-frame pixel sums are restatable in SQL. The inverse of
``kernel/avicodec.py`` + ``kernel/jpegcodec.py``.
"""

from __future__ import annotations

from wpextract_spark.kernel.avicodec import build_avi_mjpeg
from wpextract_spark.sources.imagegen import build_jpeg_gradient

#: frame rate of generated clips (arbitrary, carried in the header)
FPS = 5


def build_gradient_video(doc_id: int) -> tuple[int, int, int, bytes]:
    """Deterministic (width, height, n_frames, payload) MJPEG AVI for a
    doc id. Pure arithmetic so a SQL oracle restates the decoded sums:
    width = 16 + id % 48, height = 16 + (id * 7) % 48,
    n_frames = 2 + id % 6,
    frame f pixel(r, c) = ((id * 37) % 256 + f * 11 + r//8 + c//8) % 256.
    """
    width = 16 + doc_id % 48
    height = 16 + (doc_id * 7) % 48
    n_frames = 2 + doc_id % 6
    base = (doc_id * 37) % 256
    frames = [
        build_jpeg_gradient(width, height, (base + f * 11) % 256)
        for f in range(n_frames)
    ]
    return width, height, n_frames, build_avi_mjpeg(frames, width, height, FPS)


def build_gradient_mjpeg_stream(doc_id: int) -> tuple[int, int, int, bytes]:
    """Deterministic (width, height, n_frames, payload) RAW MJPEG STREAM
    (concatenated JPEGs, no container — kernel/mjpegcodec.py) for a doc id.
    Same frame arithmetic as :func:`build_gradient_video`, so the same SQL
    oracle restates the decoded sums for either wrapper."""
    from wpextract_spark.kernel.mjpegcodec import build_mjpeg_stream

    width = 16 + doc_id % 48
    height = 16 + (doc_id * 7) % 48
    n_frames = 2 + doc_id % 6
    base = (doc_id * 37) % 256
    frames = [
        build_jpeg_gradient(width, height, (base + f * 11) % 256)
        for f in range(n_frames)
    ]
    return width, height, n_frames, build_mjpeg_stream(frames)

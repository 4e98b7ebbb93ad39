"""Pure-Python PCM WAV sample decode (no codec library).

Completes the audio half of the multimodal family the same way
``kernel/pngcodec.py`` / ``kernel/gifcodec.py`` / ``kernel/jpegcodec.py``
completed images: ``kernel/audiometa.py`` sniffs RIFF headers only, while
this module actually decodes the ``data`` chunk's PCM frames so sample-level
statistics (loudness, peaks, clipping) are computable in a distributed pass.

Scope: the formats a crawl stores losslessly — integer PCM (format tag 1)
at 8-bit unsigned or 16/32-bit signed, and IEEE-float PCM (format tag 3)
at 32-bit, any channel count. Compressed formats (MP3/AAC/ADPCM) stay
behind the honest pluggable-decoder seam in ``operators/multimodal.py``.

Reference scope note: wpextract has no audio decode path at all (media are
downloaded as opaque files, ``src/wpextract/download/downloader.py``); this
module is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np


def decode_wav(payload: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """(sample_rate, n_channels, samples) for a PCM WAV, else None.

    ``samples`` is a 1-D interleaved numpy array: int16/int32 for integer
    PCM (8-bit unsigned is rebased to signed int16-range values ×256 so all
    integer depths share a scale), float32 for IEEE-float PCM. Trailing
    partial frames in a truncated ``data`` chunk are dropped; garbage and
    unsupported encodings return None (quarantine contract — never raises).
    """
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(payload)
    sample_rate = n_channels = bits = audio_fmt = None
    data: Optional[bytes] = None
    while pos + 8 <= n:
        chunk_id = payload[pos : pos + 4]
        (chunk_size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = pos + 8
        if chunk_id == b"fmt " and body + 16 <= n:
            audio_fmt, n_channels, sample_rate, _rate, _align, bits = struct.unpack(
                "<HHIIHH", payload[body : body + 16]
            )
        elif chunk_id == b"data":
            data = payload[body : min(body + chunk_size, n)]
        if sample_rate is not None and data is not None:
            break
        pos = body + chunk_size + (chunk_size & 1)  # chunks are word-aligned
    if not sample_rate or not n_channels or data is None:
        return None
    if audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    elif audio_fmt == 1 and bits == 32:
        samples = np.frombuffer(data[: len(data) & ~3], dtype="<i4")
    elif audio_fmt == 1 and bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.int16)
        samples = (raw - 128) * 256
    elif audio_fmt == 3 and bits == 32:
        samples = np.frombuffer(data[: len(data) & ~3], dtype="<f4")
    else:
        return None
    n_frames = len(samples) // n_channels
    return sample_rate, n_channels, samples[: n_frames * n_channels]


def pcm_stats(payload: bytes) -> Optional[Tuple[int, int, int, int]]:
    """(n_samples, sum_samples, sum_squares, peak_abs) over decoded samples
    (interleaved count: frames × channels).

    All-integer for integer PCM, so values cross engines with no
    representational ambiguity (the q_audio_pcm oracle restates the
    generator arithmetic exactly). Float PCM is rounded toward the same
    integer contract after scaling by 2^15.
    """
    decoded = decode_wav(payload)
    if decoded is None:
        return None
    _rate, _ch, samples = decoded
    if samples.dtype == np.float32:
        samples = np.rint(samples.astype(np.float64) * 32768.0).astype(np.int64)
    s = samples.astype(np.int64)
    peak = int(np.abs(s).max()) if len(s) else 0
    return (len(s), int(s.sum()), int((s * s).sum()), peak)

"""Deterministic generator of minimal PCM WAV payloads.

The inverse of ``kernel/audiometa.py`` — synthesizes crawl-style binary audio
columns for tests/benchmarks (sandbox rule: no external data). Output is a
complete, spec-valid 16-bit mono PCM WAV with a deterministic triangle-wave
sample pattern.
"""

from __future__ import annotations

import struct


def build_wav(n_samples: int, sample_rate: int) -> bytes:
    """Complete valid 16-bit mono PCM WAV with ``n_samples`` frames."""
    block_align = 2  # mono, 16-bit
    byte_rate = sample_rate * block_align
    data = b"".join(
        struct.pack("<h", ((i * 257) % 16384) - 8192) for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, block_align, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def build_audio(doc_id: int) -> tuple[int, int, bytes]:
    """Deterministic (sample_rate, n_samples, payload) for a document id.

    Pure arithmetic in ``doc_id`` so a SQL oracle can restate it:
    sample_rate = 8000 + (id % 5) * 2000, n_samples = 1000 + (id * 37) % 4000.
    """
    sample_rate = 8000 + (doc_id % 5) * 2000
    n_samples = 1000 + (doc_id * 37) % 4000
    return sample_rate, n_samples, build_wav(n_samples, sample_rate)

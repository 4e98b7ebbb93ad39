"""Perceptual image hashing over decoded pixels (no codec library).

Average-hash (aHash): nearest-neighbor downsample the image to 8x8, then
emit one bit per cell — is this cell brighter than the image's 8x8 mean?
Near-identical images (rescaled, re-encoded, minor edits) land on equal or
near-equal (small Hamming distance) hashes, so exact-hash grouping or the
SimHash-style banded join turns image near-dup detection into a relational
problem.

The threshold comparison is done in integers (``64 * cell > sum(cells)``)
instead of against a floating mean, so the hash is bit-identical across
engines and the SQL oracle can restate it exactly.

Reference scope note: wpextract stores media as opaque downloads
(``src/wpextract/download/downloader.py``); perceptual dedup belongs to the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def average_hash(
    width: int, height: int, channels: int, pixels: bytes, grid: int = 8
) -> Optional[str]:
    """``grid*grid``-char bitstring aHash of a decoded image, else None.

    ``pixels`` is the row-major interleaved uint8 buffer the image codecs
    (kernel/pngcodec.py, gifcodec.py, jpegcodec.py) return. Multi-channel
    images are reduced to luminance by the exact-integer channel mean
    (floor division, engine-portable). A string (not int64) so bit 63
    never fights signed overflow in a comparator.
    """
    if width <= 0 or height <= 0 or channels <= 0:
        return None
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if len(arr) != width * height * channels:
        return None
    arr = arr.reshape(height, width, channels).sum(axis=2, dtype=np.int64) // channels
    rows = (np.arange(grid) * height) // grid
    cols = (np.arange(grid) * width) // grid
    cells = arr[np.ix_(rows, cols)]
    total = int(cells.sum())
    bits = (cells.flatten() * (grid * grid) > total).astype(np.uint8)
    return "".join("1" if b else "0" for b in bits)

"""Pure-stdlib GIF pixel codec: LZW decode of the first frame.

Companion to ``kernel/pngcodec.py`` — GIF's pixel path is palette indices
compressed with variable-width LZW (GIF89a spec appendix F), which needs no
codec library either. Supported: GIF87a/GIF89a, global or local color
table, non-interlaced and interlaced (Adam-less 4-pass) first frame;
extensions are skipped. Anything malformed returns ``None`` (the quarantine
contract of the media operators). Pixels come back palette-expanded to RGB,
matching :func:`wpextract_spark.kernel.pngcodec.decode_png`'s contract.

The matching generator (``sources/imagegen.py::build_gif_gradient``) writes
a REAL LZW stream in "uncompressed GIF" form — literal codes with a CLEAR
before the code width would grow — so decoded pixels are checkable by
construction, while this decoder implements full dictionary growth and
therefore also reads normally-compressed streams.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

#: Interlace pass layout: (row offset, row step) per pass.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> Optional[bytes]:
    """GIF LZW: variable code width, CLEAR resets the table, EOI ends."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # Bit reader: GIF packs codes LSB-first.
    bitbuf = bitcnt = pos = 0
    n = len(data)

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    code_size = min_code_size + 1
    next_code = eoi + 1
    prev: Optional[bytes] = None
    while len(out) < n_pixels:
        while bitcnt < code_size:
            if pos >= n:
                return bytes(out) if len(out) == n_pixels else None
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitcnt -= code_size
        if code == clear:
            table = init_table()
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            return None
        out += entry
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels]) if len(out) >= n_pixels else None


def decode_gif(payload: bytes) -> Optional[Tuple[int, int, int, bytes]]:
    """(width, height, 3, RGB bytes) of the first frame, or None."""
    if payload is None or len(payload) < 13 or payload[:6] not in (
        b"GIF87a",
        b"GIF89a",
    ):
        return None
    _, _, flags, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_pal = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 0x07))
        global_pal = payload[pos : pos + size]
        if len(global_pal) < size:
            return None
        pos += size
    n = len(payload)
    while pos < n:
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block == 0x3B:  # trailer before any image
            return None
        if block != 0x2C:  # not an image descriptor
            return None
        break
    if pos + 10 > n:
        return None
    _, _, width, height, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
    pos += 10
    pal = global_pal
    if iflags & 0x80:
        size = 3 * (2 << (iflags & 0x07))
        pal = payload[pos : pos + size]
        if len(pal) < size:
            return None
        pos += size
    if pal is None or width == 0 or height == 0 or pos >= n:
        return None
    min_code_size = payload[pos]
    pos += 1
    data = bytearray()
    while pos < n:
        blen = payload[pos]
        pos += 1
        if blen == 0:
            break
        data += payload[pos : pos + blen]
        pos += blen
    idxs = _lzw_decode(bytes(data), min_code_size, width * height)
    if idxs is None:
        return None
    arr = np.frombuffer(idxs, dtype=np.uint8)
    palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    if int(arr.max(initial=0)) >= len(palette):
        return None
    rows = arr.reshape(height, width)
    if iflags & 0x40:  # interlaced: reorder the 4 passes into place
        out = np.empty_like(rows)
        src = 0
        for offset, step in _INTERLACE_PASSES:
            for r in range(offset, height, step):
                out[r] = rows[src]
                src += 1
        rows = out
    return (width, height, 3, palette[rows.reshape(-1)].tobytes())

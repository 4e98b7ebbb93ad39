"""Raw MJPEG stream codec: concatenated baseline JPEGs, no container.

The second real video wrapper next to the RIFF/AVI walker
(``kernel/avicodec.py``), proving the frame-decode seam generalizes beyond
one container: IP cameras and ``video/x-motion-jpeg`` HTTP endpoints emit
exactly this — frame after frame, each a complete JPEG, no index, no
header. Frame boundaries therefore come from walking the JPEG marker
structure itself, NOT from a naive ``FFD9`` byte scan: marker segments
(APPn/COM — EXIF thumbnails!) may contain ``FFD8``/``FFD9`` byte pairs in
their payload, so the walker reads each segment's declared length, and
inside entropy-coded scan data it relies on the byte-stuffing invariant
(a real ``FF`` is always followed by ``00`` or an RST marker) to find the
genuine end-of-image.

Frame decode rides on ``kernel/jpegcodec.py``, same as AVI. Inter-frame
codecs (H.264 etc.) remain behind the documented ``decoder=`` seam in
``operators/multimodal.py``.

Quarantine contract: malformed/truncated/foreign payloads return ``None``,
never raise — same as the image and AVI codecs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

_STANDALONE = {0x01} | set(range(0xD0, 0xD8))  # TEM, RST0-7: no length field


def _jpeg_end(data: bytes, pos: int) -> Optional[int]:
    """Exclusive end offset of the JPEG starting at ``pos`` via marker walk,
    or None if the structure is invalid/truncated."""
    n = len(data)
    if pos + 2 > n or data[pos] != 0xFF or data[pos + 1] != 0xD8:
        return None
    p = pos + 2
    while True:
        # fill bytes: any number of FFs may pad before a marker
        while p < n and data[p] == 0xFF and p + 1 < n and data[p + 1] == 0xFF:
            p += 1
        if p + 2 > n or data[p] != 0xFF:
            return None
        marker = data[p + 1]
        if marker == 0xD9:  # EOI
            return p + 2
        if marker == 0xD8:  # nested SOI: not valid marker structure
            return None
        if marker in _STANDALONE:
            p += 2
            continue
        if p + 4 > n:
            return None
        seg_len = (data[p + 2] << 8) | data[p + 3]
        if seg_len < 2:
            return None
        p += 2 + seg_len
        if marker == 0xDA:  # SOS: entropy-coded data follows the header
            # scan for the next true marker: FF followed by anything but
            # 00 (stuffed data byte) or D0-D7 (restart, part of the scan)
            while True:
                if p + 1 >= n:
                    return None
                if data[p] == 0xFF and data[p + 1] != 0x00:
                    if 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break  # real marker: outer loop handles it (EOI, DNL..)
                p += 1


def split_mjpeg(payload: bytes) -> Optional[List[Tuple[int, int]]]:
    """Frame spans ``[(offset, size), ...]`` of a raw MJPEG stream, or None.

    The stream must be a strict concatenation of complete JPEGs from byte 0
    to the end — anything else (leading garbage, trailing junk, a frame
    that fails the marker walk) quarantines the whole payload.  Frame bytes
    are NOT copied, so metadata sniffing stays O(marker walk).
    """
    try:
        if not payload or len(payload) < 4:
            return None
        frames: List[Tuple[int, int]] = []
        pos = 0
        n = len(payload)
        while pos < n:
            end = _jpeg_end(payload, pos)
            if end is None:
                return None
            frames.append((pos, end - pos))
            pos = end
        return frames or None
    except Exception:
        return None


def mjpeg_frames(payload: bytes, every_n: int = 1) -> Optional[List[bytes]]:
    """Every ``every_n``-th frame's raw JPEG bytes, or None."""
    spans = split_mjpeg(payload)
    if spans is None:
        return None
    return [payload[off : off + size] for off, size in spans[::every_n]]


def build_mjpeg_stream(frames: List[bytes]) -> bytes:
    """Generator inverse of :func:`split_mjpeg`: a raw MJPEG stream is the
    plain concatenation of complete JPEG frames."""
    for f in frames:
        if len(f) < 4 or f[:2] != b"\xff\xd8" or f[-2:] != b"\xff\xd9":
            raise ValueError("every frame must be a complete JPEG (SOI..EOI)")
    return b"".join(frames)

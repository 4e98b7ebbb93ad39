"""Pure-Python AVI (RIFF) container codec for MJPEG video.

Closes the video modality honestly: an MJPEG AVI is a RIFF chunk tree whose
``movi`` list carries one baseline JPEG per frame — container parsing is
pure struct walking, and frame decode rides on ``kernel/jpegcodec.py``. No
ffmpeg needed for this (real, widely-produced) format; inter-frame codecs
(H.264 etc.) remain behind the documented ``decoder=`` seam.

Layout handled (public msdn/OpenDML spec):
``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc*))``
with optional ``idx1``; frame chunks ``00dc``/``00dj`` padded to even size.

Quarantine contract: malformed/truncated/foreign payloads return ``None``,
never raise — same as the image codecs.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

_AVIF_HASINDEX = 0x00000010


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def parse_avi(payload: bytes) -> Optional[dict]:
    """Header metadata + frame offsets of an MJPEG AVI, or None.

    Returns ``{width, height, n_frames, fps, duration_s, frames}`` where
    ``frames`` is a list of (offset, size) into ``payload`` — frame bytes
    are NOT copied here, so metadata sniffing stays O(header + chunk walk).
    """
    try:
        if (
            payload is None
            or len(payload) < 24
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"AVI "
        ):
            return None
        (riff_size,) = struct.unpack("<I", payload[4:8])
        end = min(len(payload), 8 + riff_size)
        width = height = n_frames = 0
        usec_per_frame = 0
        frames: List[Tuple[int, int]] = []
        for fourcc, start, size in _chunks(payload, 12, end):
            if fourcc != b"LIST":
                continue
            list_type = payload[start : start + 4]
            if list_type == b"hdrl":
                for f2, s2, z2 in _chunks(payload, start + 4, start + size):
                    if f2 == b"avih" and z2 >= 40:
                        (usec_per_frame,) = struct.unpack(
                            "<I", payload[s2 : s2 + 4]
                        )
                        n_frames, _init, _streams, _buf, width, height = (
                            struct.unpack("<6I", payload[s2 + 16 : s2 + 40])
                        )
            elif list_type == b"movi":
                for f2, s2, z2 in _chunks(payload, start + 4, start + size):
                    # ##dc = compressed video, ##dj = MJPEG variant
                    if f2[2:4] in (b"dc", b"dj"):
                        frames.append((s2, z2))
        if width == 0 or height == 0:
            return None
        fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
        return {
            "width": width,
            "height": height,
            "n_frames": n_frames or len(frames),
            "fps": round(fps, 6),
            "duration_s": round(len(frames) / fps, 6) if fps else None,
            "frames": frames,
        }
    except Exception:
        return None


def avi_frames(payload: bytes, every_n: int = 1) -> Optional[List[bytes]]:
    """Every ``every_n``-th frame's raw bytes (JPEGs for MJPEG), or None."""
    meta = parse_avi(payload)
    if meta is None:
        return None
    return [
        payload[off : off + size]
        for off, size in meta["frames"][::every_n]
    ]


def build_avi_mjpeg(
    frames: List[bytes], width: int, height: int, fps: int = 5
) -> bytes:
    """Spec-valid MJPEG AVI from per-frame JPEG payloads (the generator
    inverse of :func:`parse_avi`; real players open the output)."""
    usec = int(1e6 / fps)
    max_bytes = max((len(f) for f in frames), default=0)

    avih = b"avih" + struct.pack(
        "<I14I",
        56,
        usec, max_bytes * fps, 0, _AVIF_HASINDEX,
        len(frames), 0, 1, max_bytes, width, height,
        0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack(
        "<I", 56
    ) + b"vids" + b"MJPG" + struct.pack(
        "<IHH6IiI4H",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0, 1, fps, 0, len(frames), max_bytes,  # init/scale/rate/start/len/buf
        -1,  # dwQuality (driver default)
        0,  # dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = b"strf" + struct.pack(
        "<IIiiHH4sIiiII",
        40, 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body

    movi_body = bytearray(b"movi")
    index = bytearray()
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    idx1 = b"idx1" + struct.pack("<I", len(index)) + bytes(index)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body

"""Pure-Python baseline JPEG codec: Huffman entropy coding + numpy IDCT.

Completes the PNG (``kernel/pngcodec.py``) / GIF (``kernel/gifcodec.py``) /
JPEG pixel-decode triad with no codec library: baseline sequential DCT
(ITU T.81 SOF0, plus SOF1 extended-sequential which decodes identically),
8-bit samples, grayscale or YCbCr with arbitrary 1-4x sampling factors,
restart markers, 8- and 16-bit quantization tables. Progressive (SOF2),
arithmetic coding, and 12-bit precision return ``None`` — the quarantine
contract of the media operators (never raise on a corrupt/foreign payload).

The encoder emits spec-valid baseline JPEGs with an all-ones quantization
table ("quality 100+") and the T.81 Annex K example Huffman tables. For
images whose pixels are CONSTANT within each 8x8 block, the forward DCT has
only a DC coefficient (an exact integer, 8*(v-128)) and the decode
round-trips bit-exactly in float64 — which is what makes synthetic JPEG
payloads oracle-checkable: a SQL engine can restate the block arithmetic
without modeling DCT rounding (see ``sources/imagegen.build_jpeg_gradient``).

Scale note: decode cost is per-payload and embarrassingly parallel — the
operators wrap this in Arrow-batched ``mapInPandas`` stages. Huffman decode
is a per-bit Python loop (entropy coding is inherently sequential per
block); the IDCT and color conversion are vectorized numpy. A production
deployment plugs libjpeg-turbo through the same ``decoder=`` seam.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables (ITU T.81 public spec constants)

#: zig-zag scan order: index k in the scan -> natural (row-major) position
ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 example Huffman tables (luminance); legal for any component.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _basis() -> np.ndarray:
    """A[u, x] = C(u)/2 * cos((2x+1) u pi / 16): IDCT(F) = A.T @ F @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = (c / 2.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _basis()


def _assign_codes(bits: List[int], vals: List[int]):
    """Canonical Huffman codes per T.81 C.2: [(value, code, length), ...]."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[i], code, length))
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    return {(length, code): v for v, code, length in _assign_codes(bits, vals)}


def _encode_table(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    return {v: (code, length) for v, code, length in _assign_codes(bits, vals)}


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` raw bits to a signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing.

    Hitting a non-RST marker ends the scan (reads past it raise, which the
    decoder surfaces as a quarantined ``None``).
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def read_bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("marker inside scan")
            self.buf = b
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad huffman code")

    def restart(self) -> None:
        """Align to byte and consume an RSTn marker."""
        self.cnt = 0
        d, p = self.data, self.pos
        if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("missing restart marker")
        self.pos = p + 2


def _decode_block(
    reader: _BitReader,
    dc_tab: Dict[Tuple[int, int], int],
    ac_tab: Dict[Tuple[int, int], int],
    quant: np.ndarray,
    pred: int,
) -> Tuple[np.ndarray, int]:
    """One 8x8 block: Huffman decode -> dequantize -> IDCT. Returns
    (spatial block float64, new DC predictor)."""
    coef = np.zeros(64)
    size = reader.read_huffman(dc_tab)
    diff = _extend(reader.read_bits(size), size) if size else 0
    dc = pred + diff
    coef[0] = dc * quant[0]
    k = 1
    while k < 64:
        rs = reader.read_huffman(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC index overflow")
        coef[ZIGZAG[k]] = _extend(reader.read_bits(size), size) * quant[k]
        k += 1
    f = coef.reshape(8, 8)
    return _A.T @ f @ _A, dc


def decode_jpeg(payload: bytes) -> Optional[Tuple[int, int, int, bytes]]:
    """(width, height, channels, row-major interleaved pixel bytes) or None.

    channels is 1 (grayscale) or 3 (RGB after JFIF YCbCr conversion).
    Never raises on truncated/garbage/unsupported input.
    """
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(payload: bytes) -> Optional[Tuple[int, int, int, bytes]]:
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    quant: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    frame = None  # (w, h, [(comp_id, H, V, Tq), ...])
    dri = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                zz = np.zeros(64)
                if pq == 0:
                    zz[:] = np.frombuffer(body[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    zz[:] = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.float64)
                    i += 128
                quant[tq] = zz  # kept in zig-zag order (decode scans zig-zag)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                count = sum(bits)
                vals = list(body[i + 17 : i + 17 + count])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + count
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline-decodable)
            if body[0] != 8:
                return None  # 12-bit precision unsupported
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive/arithmetic/hierarchical
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            scan = []
            ns = body[0]
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            data_start = pos + 2 + seg_len
            return _decode_scan(payload, data_start, frame, scan, quant, huff, dri)
        pos += 2 + seg_len
    return None


def _decode_scan(payload, pos, frame, scan, quant, huff, dri):
    w, h, comps = frame
    if w == 0 or h == 0:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    by_id = {c[0]: c for c in comps}
    # Component planes padded to whole blocks (or whole MCUs if interleaved).
    planes: Dict[int, np.ndarray] = {}
    dims: Dict[int, Tuple[int, int]] = {}
    for cid, ch, cv, _tq in comps:
        cw = -(-w * ch // hmax)  # ceil
        chh = -(-h * cv // vmax)
        dims[cid] = (cw, chh)
    reader = _BitReader(payload, pos)
    preds = {cs: 0 for cs, _, _ in scan}

    def tables(cs, td, ta, tq):
        return huff[(0, td)], huff[(1, ta)], quant[tq]

    if len(scan) == 1:
        cs, td, ta = scan[0]
        _cid, _ch, _cv, tq = by_id[cs]
        cw, chh = dims[cs]
        bx, by = -(-cw // 8), -(-chh // 8)
        plane = np.zeros((by * 8, bx * 8))
        dc_t, ac_t, qt = tables(cs, td, ta, tq)
        unit = 0
        for b in range(bx * by):
            if dri and unit == dri:
                reader.restart()
                preds[cs] = 0
                unit = 0
            r, c = divmod(b, bx)
            block, preds[cs] = _decode_block(reader, dc_t, ac_t, qt, preds[cs])
            plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = block
            unit += 1
        planes[cs] = plane
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        for cs, _td, _ta in scan:
            _cid, ch, cv, _tq = by_id[cs]
            planes[cs] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and unit == dri:
                    reader.restart()
                    for k in preds:
                        preds[k] = 0
                    unit = 0
                for cs, td, ta in scan:
                    _cid, ch, cv, tq = by_id[cs]
                    dc_t, ac_t, qt = tables(cs, td, ta, tq)
                    for v in range(cv):
                        for u in range(ch):
                            block, preds[cs] = _decode_block(
                                reader, dc_t, ac_t, qt, preds[cs]
                            )
                            r0 = (my * cv + v) * 8
                            c0 = (mx * ch + u) * 8
                            planes[cs][r0 : r0 + 8, c0 : c0 + 8] = block
                unit += 1

    # Upsample every component to full resolution, crop, convert.
    full = []
    for cs, _td, _ta in scan:
        _cid, ch, cv, _tq = by_id[cs]
        p = planes[cs]
        if ch != hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv != vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(full) == 3:
        y, cb, cr = full
        cb = cb - 128.0
        cr = cr - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, out.tobytes()
    return None


# ---------------------------------------------------------------------------
# Encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.cnt = 0

    def flush(self) -> bytes:
        if self.cnt:
            self.write((1 << (8 - self.cnt)) - 1, 8 - self.cnt)  # pad with 1s
        return bytes(self.out)


_ENC_DC = _encode_table(_DC_BITS, _DC_VALS)
_ENC_AC = _encode_table(_AC_BITS, _AC_VALS)


def _encode_block(writer: _BitWriter, block: np.ndarray, pred: int) -> int:
    """Forward DCT (all-ones quant) + Huffman-encode one 8x8 block."""
    f = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    coef = np.round(f.reshape(64)[ZIGZAG]).astype(np.int64)  # zig-zag scan
    diff = int(coef[0]) - pred
    mag = abs(diff)
    size = mag.bit_length()
    code, length = _ENC_DC[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    last_nz = int(np.max(np.nonzero(coef)[0])) if np.any(coef[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while coef[k] == 0:
            run += 1
            k += 1
        while run > 15:
            zc, zl = _ENC_AC[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        v = int(coef[k])
        size = abs(v).bit_length()
        code, length = _ENC_AC[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        k += 1
    if last_nz < 63:
        code, length = _ENC_AC[0x00]  # EOB
        writer.write(code, length)
    return int(coef[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _pad_to(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Edge-replicate pad to (rows, cols) — keeps constant blocks constant."""
    r, c = plane.shape
    return np.pad(plane, ((0, rows - r), (0, cols - c)), mode="edge")


def encode_jpeg(
    planes: List[np.ndarray],
    sampling: Optional[List[Tuple[int, int]]] = None,
    restart_interval: int = 0,
) -> bytes:
    """Spec-valid baseline JPEG from 1 (gray) or 3 (YCbCr) component planes.

    ``planes[i]`` must already be at its subsampled resolution:
    ``ceil(w * H_i / Hmax) x ceil(h * V_i / Vmax)`` where (w, h) are the
    dimensions of plane 0. All components share the all-ones quantization
    table and the Annex K example Huffman tables (table ids 0).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every that
    many MCUs (resync points a streaming decoder can recover at).
    """
    sampling = sampling or [(1, 1)] * len(planes)
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    h, w = planes[0].shape

    app0 = _seg(
        0xE0,
        b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 72, 72, 0, 0),
    )
    dqt = _seg(0xDB, b"\x00" + b"\x01" * 64)
    sof_body = b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (sh, sv) in enumerate(sampling):
        sof_body += bytes([i + 1, (sh << 4) | sv, 0])
    sof0 = _seg(0xC0, sof_body)
    dht = _seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos_body = bytes([ncomp])
    for i in range(ncomp):
        sos_body += bytes([i + 1, 0x00])
    sos = _seg(0xDA, sos_body + b"\x00\x3f\x00")
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )

    scan = bytearray()
    writer = _BitWriter()
    preds = [0] * ncomp
    unit = 0
    rst = 0

    def maybe_restart():
        nonlocal writer, unit, rst
        if restart_interval and unit == restart_interval:
            scan.extend(writer.flush())
            scan.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            writer = _BitWriter()
            for i in range(ncomp):
                preds[i] = 0
            unit = 0

    if ncomp == 1:
        bx, by = -(-w // 8), -(-h // 8)
        plane = _pad_to(planes[0], by * 8, bx * 8)
        for b in range(bx * by):
            maybe_restart()
            r, c = divmod(b, bx)
            preds[0] = _encode_block(
                writer, plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8], preds[0]
            )
            unit += 1
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        padded = [
            _pad_to(p, mcus_y * sv * 8, mcus_x * sh * 8)
            for p, (sh, sv) in zip(planes, sampling)
        ]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for i, (sh, sv) in enumerate(sampling):
                    for v in range(sv):
                        for u in range(sh):
                            r0 = (my * sv + v) * 8
                            c0 = (mx * sh + u) * 8
                            preds[i] = _encode_block(
                                writer,
                                padded[i][r0 : r0 + 8, c0 : c0 + 8],
                                preds[i],
                            )
                unit += 1
    scan.extend(writer.flush())

    return (
        b"\xff\xd8" + app0 + dqt + dri + sof0 + dht + sos
        + bytes(scan) + b"\xff\xd9"
    )


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Grayscale baseline JPEG. Bit-exact round-trip is guaranteed when
    pixels are constant within each aligned 8x8 block (DC-only spectrum)."""
    return encode_jpeg([np.asarray(pixels, dtype=np.uint8)])

"""Minimal PDF text extraction — pure Python + stdlib zlib.

north_rule coverage of the extraction tier's "PDF/layout parse": a
from-scratch parser for the text content of simple PDFs, the overwhelmingly
common case in a web crawl (reports, articles, invoices produced by standard
generators). Scope, honestly bounded:

* body object scan (``N G obj … endobj``) — no reliance on the xref table,
  so mildly damaged / appended-to files still parse;
* object model: dicts, arrays, names, numbers, strings (literal with escape
  sequences and hex), references, booleans/null;
* streams: raw or ``/FlateDecode`` (zlib), per-page ``/Contents`` as a
  single stream or an array of streams;
* content-stream text operators: ``BT/ET``, ``Tj``, ``TJ`` (kerning arrays),
  ``'``, ``"``, with line structure from ``Td/TD/T*/'/"``;
* string bytes decoded as Latin-1 (≈ PDFDocEncoding for the ASCII range).

Out of scope — these RAISE :class:`PdfParseError` (never silently return
wrong text), which the Spark UDF layer routes to the per-document quarantine
column exactly like a pathological HTML page (``operators/extract.py``):
encrypted files (``/Encrypt``), filters other than FlateDecode, and
CID/Type0 fonts with a ``ToUnicode`` CMap requirement are not implemented.

The inverse — a deterministic generator of simple PDFs used by tests, the
benchmark, and the oracle roundtrip query — lives in ``sources/pdfgen.py``.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Optional, Union

_WS = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")
_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")
_BARE_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


class PdfParseError(ValueError):
    """The document uses a PDF feature outside this parser's scope, or is
    structurally broken. Extraction must quarantine, not guess."""


class Ref:
    """An indirect object reference ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Ref({self.num},{self.gen})"


class Name(str):
    """A PDF name (``/Type``); distinct from strings in dict values."""

    __slots__ = ()


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment to end of line
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
        else:
            break
    return pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """``(...)`` with nesting and backslash escapes (PDF 32000-1 §7.3.4.2)."""
    assert data[pos] == 0x28
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: backslash dropped
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfParseError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    assert data[pos] == 0x3C
    end = data.find(b">", pos + 1)
    if end < 0:
        raise PdfParseError("unterminated hex string")
    digits = bytes(c for c in data[pos + 1 : end] if c not in _WS)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")), end + 1
    except ValueError as exc:
        raise PdfParseError(f"bad hex string: {exc}") from None


def parse_value(data: bytes, pos: int) -> tuple[Any, int]:
    """Parse one PDF object value at ``pos``; returns (value, new_pos)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfParseError("unexpected end of data")
    c = data[pos]
    if data.startswith(b"<<", pos):
        pos += 2
        out: dict[str, Any] = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return out, pos + 2
            if pos >= len(data):
                raise PdfParseError("unterminated dictionary")
            key, pos = parse_value(data, pos)
            if not isinstance(key, Name):
                raise PdfParseError(f"dict key is not a name: {key!r}")
            val, pos = parse_value(data, pos)
            out[str(key)] = val
    if c == 0x3C:  # '<' hex string
        return _parse_hex_string(data, pos)
    if c == 0x28:  # '(' literal string
        return _parse_literal_string(data, pos)
    if c == 0x2F:  # '/' name
        m = _NAME_RE.match(data, pos)
        return Name(m.group(1).decode("latin-1")), m.end()
    if c == 0x5B:  # '['
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if pos < len(data) and data[pos] == 0x5D:
                return arr, pos + 1
            if pos >= len(data):
                raise PdfParseError("unterminated array")
            val, pos = parse_value(data, pos)
            arr.append(val)
    rm = _REF_RE.match(data, pos)
    if rm is not None:
        return Ref(int(rm.group(1)), int(rm.group(2))), rm.end()
    nm = _NUM_RE.match(data, pos)
    if nm is not None:
        tok = nm.group()
        return (float(tok) if b"." in tok else int(tok)), nm.end()
    bm = _BARE_RE.match(data, pos)
    if bm is not None:
        word = bm.group()
        if word == b"true":
            return True, bm.end()
        if word == b"false":
            return False, bm.end()
        if word == b"null":
            return None, bm.end()
        raise PdfParseError(f"unexpected token {word[:20]!r}")
    raise PdfParseError(f"unexpected byte {bytes([c])!r}")


def _scan_objects(data: bytes) -> dict[int, tuple[Any, Optional[bytes]]]:
    """All body objects by number: {num: (value, raw_stream_or_None)}.

    Scan-based (no xref): tolerant of incremental updates and broken
    offsets; later definitions of the same object number win, matching
    incremental-update semantics. After an object with a stream, scanning
    resumes past its ``endstream`` — compressed stream interiors can contain
    bytes that look like ``N G obj`` and must never shadow a real object.
    """
    objects: dict[int, tuple[Any, Optional[bytes]]] = {}
    scan_pos = 0
    while True:
        m = _OBJ_RE.search(data, scan_pos)
        if m is None:
            break
        scan_pos = m.end()
        num = int(m.group(1))
        try:
            value, pos = parse_value(data, m.end())
        except PdfParseError:
            continue  # e.g. object inside a string; harmless to skip
        stream: Optional[bytes] = None
        pos = _skip_ws(data, pos)
        if data.startswith(b"stream", pos):
            start = pos + len(b"stream")
            if data.startswith(b"\r\n", start):
                start += 2
            elif data.startswith(b"\n", start):
                start += 1
            length = value.get("Length") if isinstance(value, dict) else None
            if isinstance(length, int):
                end = start + length
                if not _ENDSTREAM_RE.match(data, end):
                    end = data.find(b"endstream", start)
            else:  # /Length is a ref or missing: locate the keyword
                end = data.find(b"endstream", start)
            if end < 0:
                raise PdfParseError("unterminated stream")
            stream = data[start:end]
            keyword = data.find(b"endstream", end)
            scan_pos = keyword + len(b"endstream") if keyword >= 0 else end
        else:
            scan_pos = pos
        objects[num] = (value, stream)
    return objects


_ENDSTREAM_RE = re.compile(rb"\s*endstream")


class _Pdf:
    def __init__(self, data: bytes) -> None:
        if not data.lstrip(b"\x00").startswith(b"%PDF-"):
            raise PdfParseError("missing %PDF header")
        self.objects = _scan_objects(data)
        if not self.objects:
            raise PdfParseError("no objects found")
        for value, _ in self.objects.values():
            if isinstance(value, dict):
                if "Encrypt" in value:
                    raise PdfParseError("encrypted PDF not supported")
                if str(value.get("Type", "")) == "ObjStm":
                    # PDF 1.5+ compressed object streams hold the page tree
                    # inside a Flate-packed stream this parser does not
                    # unpack: raising routes the document to quarantine
                    # instead of silently extracting nothing.
                    raise PdfParseError("object streams (ObjStm) not supported")
        # /Encrypt normally lives in the TRAILER dict (not an 'N G obj'
        # body object), which the body scan above never sees.
        pos = 0
        while True:
            t = data.find(b"trailer", pos)
            if t < 0:
                break
            try:
                value, _ = parse_value(data, _skip_ws(data, t + 7))
            except PdfParseError:
                value = None
            if isinstance(value, dict) and "Encrypt" in value:
                raise PdfParseError("encrypted PDF not supported")
            pos = t + 7

    def resolve(self, value: Any) -> Any:
        seen = 0
        while isinstance(value, Ref):
            entry = self.objects.get(value.num)
            if entry is None:
                return None
            value = entry[0]
            seen += 1
            if seen > 32:
                raise PdfParseError("reference cycle")
        return value

    def stream_bytes(self, ref: Any) -> bytes:
        """Decoded bytes of a stream object (raw or FlateDecode)."""
        if not isinstance(ref, Ref):
            raise PdfParseError("content stream must be an indirect object")
        entry = self.objects.get(ref.num)
        if entry is None or entry[1] is None:
            raise PdfParseError(f"missing stream object {ref.num}")
        value, raw = entry
        filters = self.resolve(value.get("Filter")) if isinstance(value, dict) else None
        if filters is None:
            filters = []
        elif not isinstance(filters, list):
            filters = [filters]
        out = raw
        for f in filters:
            if str(f) == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error as exc:
                    raise PdfParseError(f"bad Flate stream: {exc}") from None
            else:
                raise PdfParseError(f"unsupported stream filter /{f}")
        return out

    def pages(self) -> list[dict]:
        """Page dicts in object-number order (document order for every
        common generator, which emits pages sequentially)."""
        out = []
        for num in sorted(self.objects):
            value, _ = self.objects[num]
            if isinstance(value, dict) and str(value.get("Type", "")) == "Page":
                out.append(value)
        return out


# -- content-stream text interpreter ---------------------------------------

#: Operators that move to a new line; a newline is emitted between the text
#: they separate. ' and " also show their string argument.
_LINE_OPS = frozenset({b"Td", b"TD", b"T*", b"'", b'"'})
_STRING_SHOW_OPS = frozenset({b"Tj", b"'", b'"'})
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _content_text(content: bytes) -> str:
    """Interpret the text-showing operators of one content stream."""
    parts: list[str] = []
    stack: list[Any] = []
    pos = 0
    n = len(content)
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos]
        if c == 0x28:
            s, pos = _parse_literal_string(content, pos)
            stack.append(s)
            continue
        if content.startswith(b"<<", pos):
            val, pos = parse_value(content, pos)  # inline dicts (e.g. BDC)
            stack.append(val)
            continue
        if c == 0x3C:
            s, pos = _parse_hex_string(content, pos)
            stack.append(s)
            continue
        if c == 0x5B:
            val, pos = parse_value(content, pos)
            stack.append(val)
            continue
        if c == 0x2F:
            val, pos = parse_value(content, pos)
            stack.append(val)
            continue
        nm = _NUM_RE.match(content, pos)
        if nm is not None:
            stack.append(nm.group())
            pos = nm.end()
            continue
        om = _OP_RE.match(content, pos)
        if om is None:
            pos += 1  # unknown byte: skip
            continue
        op = om.group()
        pos = om.end()
        if op in _LINE_OPS and parts and parts[-1] != "\n":
            parts.append("\n")
        if op in _STRING_SHOW_OPS:
            if stack and isinstance(stack[-1], bytes):
                parts.append(stack[-1].decode("latin-1"))
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for item in stack[-1]:
                    if isinstance(item, bytes):
                        parts.append(item.decode("latin-1"))
        elif op == b"BI":
            # Inline image: skip to EI (binary payload would desync the lexer)
            end = content.find(b"EI", pos)
            pos = n if end < 0 else end + 2
        stack.clear()
    return "".join(parts).strip("\n")


def extract_pdf_text(data: Union[bytes, bytearray]) -> tuple[str, int]:
    """Extract ``(text, n_pages)`` from a simple PDF.

    Page texts are joined with a single newline; line structure within a
    page follows the Td/TD/T*/'/" operators. Raises :class:`PdfParseError`
    for out-of-scope documents (see module docstring).
    """
    pdf = _Pdf(bytes(data))
    page_texts = []
    pages = pdf.pages()
    if not pages:
        # A structurally valid PDF with no reachable Page objects means the
        # page tree lives somewhere this parser cannot see — raise rather
        # than silently returning ('', 0).
        raise PdfParseError("no page objects found")
    for page in pages:
        contents = pdf.resolve(page.get("Contents"))
        refs = page.get("Contents")
        if isinstance(refs, Ref) and isinstance(contents, list):
            refs = contents
        if refs is None:
            page_texts.append("")
            continue
        if not isinstance(refs, list):
            refs = [refs]
        blob = b"\n".join(pdf.stream_bytes(r) for r in refs)
        page_texts.append(_content_text(blob))
    return "\n".join(page_texts), len(pages)

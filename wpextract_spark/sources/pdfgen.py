"""Deterministic generator of simple text PDFs.

The inverse of ``kernel/pdf.py``: builds spec-correct single/multi-page PDFs
(classic xref table, Helvetica Type1, one Flate-compressed content stream per
page) from text, byte-for-byte deterministic. Used by the PDF kernel tests,
the ``q_pdf_roundtrip`` oracle query (encode in Spark, decode in Spark,
compare against the expected text in DuckDB), and the benchmark. No external
data and no randomness — the sandbox protocol for synthesizing crawl-style
binary payloads.
"""

from __future__ import annotations

import zlib


def _escape(line: str) -> str:
    return line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(page_text: str) -> bytes:
    ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for i, line in enumerate(page_text.split("\n")):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({_escape(line)}) Tj")
    ops.append("ET")
    # Non-Latin-1 characters (emoji, CJK, curly quotes) cannot exist in a
    # WinAnsi-encoded content stream: replace with '?' rather than failing the
    # whole Spark task on one document. Mirrored in ORACLE_PDF_ROUNDTRIP.
    return "\n".join(ops).encode("latin-1", errors="replace")


def build_pdf(pages: list[str], compress: bool = True) -> bytes:
    """A complete PDF whose extracted text is ``"\\n".join(pages)`` (with
    each page's internal newlines preserved as Td line breaks)."""
    objects: list[bytes] = []  # bodies, object number = index + 1

    n_pages = len(pages)
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{n} 0 R" for n in page_obj_nums)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )  # 3
    for i, page_text in enumerate(pages):
        page_num = page_obj_nums[i]
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                f" /Resources << /Font << /F1 3 0 R >> >>"
                f" /Contents {content_num} 0 R >>"
            ).encode()
        )
        raw = _content_stream(page_text)
        if compress:
            data = zlib.compress(raw, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = raw
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xc7\xec\x8f\xa2\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)

"""PDF text-extraction kernel: generator/parser roundtrips, operator
boundaries, and quarantine paths (north_rule "PDF/layout parse" leg)."""

import zlib

import pytest

from wpextract_spark.kernel.pdf import (
    PdfParseError,
    _content_text,
    extract_pdf_text,
    parse_value,
)
from wpextract_spark.sources.pdfgen import build_pdf


# -- roundtrips -------------------------------------------------------------


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize(
    "pages",
    [
        ["hello world"],
        ["line one\nline two\nline three"],
        ["page one", "page two\nwith second line"],
        ["parens (nested (deep)) and \\ backslash\nrow 2"],
        ["", "only page two has text"],
        ["a" * 2000],  # long single line
    ],
)
def test_roundtrip(pages, compress):
    pdf = build_pdf(pages, compress=compress)
    text, n_pages = extract_pdf_text(pdf)
    assert n_pages == len(pages)
    assert text == "\n".join(pages)


def test_deterministic_bytes():
    assert build_pdf(["x", "y"]) == build_pdf(["x", "y"])


# -- object model -----------------------------------------------------------


def test_parse_value_dict_array_refs():
    val, _ = parse_value(
        b"<< /Type /Page /Nums [1 2.5 (s) <414243> true null] /Parent 2 0 R >>", 0
    )
    assert str(val["Type"]) == "Page"
    assert val["Nums"] == [1, 2.5, b"s", b"ABC", True, None]
    assert val["Parent"].num == 2


def test_literal_string_escapes():
    val, _ = parse_value(rb"(a\(b\)c \\ \n \t \101 \8)", 0)
    # \8 is not an escape: backslash dropped; \101 is octal 'A'
    assert val == b"a(b)c \\ \n \t A 8"


# -- content-stream interpreter --------------------------------------------


def test_tj_array_and_hex_strings():
    assert _content_text(b"BT [ (A) -120 (B) ] TJ T* <4344> Tj ET") == "AB\nCD"


def test_quote_operators_move_lines():
    assert _content_text(b"BT (a) Tj (b) ' 1 2 (c) \" ET") == "a\nb\nc"


def test_inline_image_skipped():
    content = b"BT (x) Tj BI /W 1 /H 1 ID \x00\xff\x28 EI (y) Tj ET"
    # binary payload (incl. an unbalanced '(') must not desync the lexer
    assert _content_text(content) == "xy"


# -- quarantine paths -------------------------------------------------------


def test_not_a_pdf():
    with pytest.raises(PdfParseError):
        extract_pdf_text(b"<html>not a pdf</html>")


def test_encrypted_rejected():
    bad = build_pdf(["x"]).replace(b"/Type /Catalog", b"/Type /Catalog /Encrypt 9 0 R")
    with pytest.raises(PdfParseError, match="encrypted"):
        extract_pdf_text(bad)


def test_unknown_filter_rejected():
    bad = build_pdf(["x"]).replace(b"/Filter /FlateDecode", b"/Filter /JPXDecode")
    with pytest.raises(PdfParseError, match="unsupported stream filter"):
        extract_pdf_text(bad)


def test_corrupt_flate_rejected():
    good = build_pdf(["stable text"])
    start = good.find(b"stream\n") + len(b"stream\n")
    bad = good[:start] + b"\x00\x00" + good[start + 2 :]
    with pytest.raises(PdfParseError):
        extract_pdf_text(bad)


def test_incremental_update_last_wins():
    """A re-defined object later in the file (incremental update) wins."""
    base = build_pdf(["old"], compress=False)
    # re-append page 4's content object (number 5) with new text
    new_stream = b"BT (new) Tj ET"
    update = (
        b"5 0 obj\n<< /Length "
        + str(len(new_stream)).encode()
        + b" >>\nstream\n"
        + new_stream
        + b"\nendstream\nendobj\n"
    )
    text, n = extract_pdf_text(base + update)
    assert (text, n) == ("new", 1)


def test_stream_interior_cannot_shadow_objects():
    """Bytes inside a content stream that look like a later `N 0 obj`
    definition must not shadow the real object (the scanner resumes past
    `endstream`, never inside stream interiors)."""
    from wpextract_spark.kernel.pdf import extract_pdf_text

    real_ops = b"BT /F1 11 Tf 72 720 Td (REAL) Tj ET"
    # Decoy later-definition of the content object itself: under
    # later-definition-wins, a scanner that walks stream interiors would
    # replace object 5 with this string and lose the page text. (A pushed
    # string without Tj draws nothing, so the decoy bytes themselves are
    # inert for the content interpreter.)
    fake_def = b"\n5 0 obj\n(FAKE)\nendobj\n"
    interior = real_ops + fake_def  # stream content containing a decoy object
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(interior), interior),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for num, body in enumerate(objects, start=1):
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"

    text, n_pages = extract_pdf_text(bytes(out))
    assert n_pages == 1
    assert text == "REAL"


def test_objstm_and_pageless_pdfs_quarantined():
    """PDF 1.5 object-stream documents (and any PDF with no reachable Page
    objects) must raise, never silently return ('', 0)."""
    import pytest
    import zlib

    from wpextract_spark.kernel.pdf import PdfParseError, extract_pdf_text

    packed = zlib.compress(b"<< /Type /Page >>")
    objstm = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /N 1 /Length "
        + str(len(packed)).encode()
        + b" >>\nstream\n"
        + packed
        + b"\nendstream\nendobj\n"
    )
    with pytest.raises(PdfParseError):
        extract_pdf_text(objstm)

    pageless = b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n%%EOF\n"
    with pytest.raises(PdfParseError):
        extract_pdf_text(pageless)


def test_trailer_encrypt_rejected():
    """/Encrypt lives in the trailer dict of classic PDFs — must be caught."""
    import pytest

    from wpextract_spark.kernel.pdf import PdfParseError, extract_pdf_text
    from wpextract_spark.sources.pdfgen import build_pdf

    pdf = build_pdf(["secret"])
    patched = pdf.replace(
        b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R", 1
    )
    with pytest.raises(PdfParseError, match="encrypted"):
        extract_pdf_text(patched)

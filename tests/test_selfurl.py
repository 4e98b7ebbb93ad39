"""Self-URL discovery parity tests (golden values from the reference's
tests/scrape/test_processor.py, same fixture bytes)."""

from pathlib import Path

import pytest

from wpextract_spark.htmlkit import parse_html
from wpextract_spark.kernel.selfurl import (
    _is_url_valid,
    extract_self_url,
    get_link_canonical,
    get_og_url,
)

DATA = Path(__file__).parent / "data" / "processor"


def _doc(name, head_only=False):
    return parse_html((DATA / name).read_text(), head_only=head_only)


@pytest.mark.parametrize(
    ("url", "expected"),
    [
        ("https://example.org/", True),
        ("http://example.org/", True),
        ("/", False),
        ("notaurl", False),
    ],
)
def test_url_valid(url, expected):
    assert _is_url_valid(url) == expected


@pytest.mark.parametrize(
    ("file", "exp_out"),
    [
        ("link_canonical.html", "https://example.org/page_canon/"),
        ("link_canonical_no_href.html", None),
        ("link_canonical_empty_href.html", None),
        ("no_head.html", None),
        ("og_url.html", None),
    ],
)
def test_get_link_canonical(file, exp_out):
    assert get_link_canonical(_doc(file)) == exp_out


@pytest.mark.parametrize(
    ("file", "exp_out"),
    [
        ("og_url.html", "https://example.org/page_og/"),
        ("og_url_no_content.html", None),
        ("og_url_empty_content.html", None),
        ("no_head.html", None),
        ("link_canonical.html", None),
    ],
)
def test_get_og_url(file, exp_out):
    assert get_og_url(_doc(file)) == exp_out


@pytest.mark.parametrize(
    ("file", "exp_out"),
    [
        ("link_canonical.html", "https://example.org/page_canon/"),
        ("og_url.html", "https://example.org/page_og/"),
        ("self_url_both.html", "https://example.org/page_canon/"),
        ("no_self_url.html", None),
    ],
)
@pytest.mark.parametrize("head_only", [False, True])
def test_extract_self_url(file, exp_out, head_only):
    # head_only exercises the strainer-analog fast path used by the crawl stage.
    assert extract_self_url(_doc(file, head_only=head_only)) == exp_out


def test_malformed_ipv6_canonical_falls_back_to_og_url():
    """A ValueError-raising canonical href (bad IPv6 bracket host) must not
    abort extraction — the og:url fallback still runs."""
    from wpextract_spark.htmlkit.dom import parse_html
    from wpextract_spark.kernel.selfurl import extract_self_url

    html = (
        '<html><head><link rel="canonical" href="http://[bad/x">'
        '<meta property="og:url" content="https://site.com/p"/></head></html>'
    )
    assert extract_self_url(parse_html(html, head_only=True)) == "https://site.com/p"

"""Sitemap-protocol kernel."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wpextract_spark.kernel.sitemap import parse_sitemap


def test_urlset_full_and_partial_entries():
    xml = (
        "<urlset>"
        "<url><loc>https://e/a?x=1&amp;y=2</loc><lastmod>2024-03-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://e/b</loc><priority>oops</priority></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"
        "</urlset>"
    )
    parsed = parse_sitemap(xml)
    assert parsed["kind"] == "urlset"
    assert parsed["entries"] == [
        {
            "loc": "https://e/a?x=1&y=2",  # entity decoded
            "lastmod": "2024-03-01",
            "changefreq": "daily",
            "priority": 0.8,
        },
        {"loc": "https://e/b", "lastmod": None, "changefreq": None, "priority": None},
    ]  # loc-less entry dropped


def test_sitemapindex():
    xml = (
        "<sitemapindex><sitemap><loc>https://e/s1.xml</loc>"
        "<lastmod>2024-02-02</lastmod></sitemap>"
        "<sitemap><loc>https://e/s2.xml</loc></sitemap></sitemapindex>"
    )
    parsed = parse_sitemap(xml)
    assert parsed["kind"] == "index"
    assert [e["loc"] for e in parsed["entries"]] == [
        "https://e/s1.xml",
        "https://e/s2.xml",
    ]


def test_xml_declaration_and_namespace_tolerated():
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://e/x</loc></url></urlset>"
    )
    assert parse_sitemap(xml)["entries"][0]["loc"] == "https://e/x"


def test_non_sitemap_payload():
    assert parse_sitemap("<html><body>404</body></html>") == {
        "kind": None,
        "entries": [],
    }
    assert parse_sitemap("")["kind"] is None


def test_whitespace_in_loc_trimmed():
    xml = "<urlset><url><loc>\n  https://e/x \n</loc></url></urlset>"
    assert parse_sitemap(xml)["entries"][0]["loc"] == "https://e/x"


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=150))
def test_total_on_arbitrary_bytes(s):
    parsed = parse_sitemap(s)
    assert parsed["kind"] in ("urlset", "index", None)
    assert isinstance(parsed["entries"], list)

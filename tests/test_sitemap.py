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


# --- RSS/Atom feeds ----------------------------------------------------------


def test_rss_feed_with_cdata_and_keyless_item():
    from wpextract_spark.kernel.feed import parse_feed

    xml = (
        "<rss><channel><title>B</title>"
        "<item><title><![CDATA[Post & <One>]]></title>"
        "<link>https://e/p1</link>"
        "<pubDate>Mon, 01 Jan 2024 10:00:00 +0000</pubDate>"
        '<guid isPermaLink="false">g1</guid></item>'
        "<item><title>keyless</title></item>"
        "<item><guid>only-guid</guid></item>"
        "</channel></rss>"
    )
    parsed = parse_feed(xml)
    assert parsed["kind"] == "rss"
    assert parsed["title"] == "B"
    assert parsed["entries"][0] == {
        "title": "Post & <One>",
        "link": "https://e/p1",
        "published": "Mon, 01 Jan 2024 10:00:00 +0000",
        "guid": "g1",
    }
    assert [e["guid"] for e in parsed["entries"]] == ["g1", "only-guid"]


def test_atom_feed_link_preference_and_updated_fallback():
    from wpextract_spark.kernel.feed import parse_feed

    xml = (
        "<feed><title>A</title><entry><title>E</title>"
        '<link rel="self" href="https://e/self"/>'
        '<link rel="alternate" href="https://e/alt"/>'
        "<id>tag:e</id><updated>2024-02-02</updated></entry>"
        '<entry><link href="https://e/bare"/><id>tag:f</id>'
        "<published>2024-03-03</published>"
        "<updated>2024-04-04</updated></entry></feed>"
    )
    parsed = parse_feed(xml)
    assert parsed["kind"] == "atom"
    assert parsed["entries"][0]["link"] == "https://e/alt"
    assert parsed["entries"][0]["published"] == "2024-02-02"  # updated fallback
    assert parsed["entries"][1]["link"] == "https://e/bare"  # rel-less = alternate
    assert parsed["entries"][1]["published"] == "2024-03-03"  # published wins


def test_non_feed_payloads_total():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wpextract_spark.kernel.feed import parse_feed

    assert parse_feed("<html><body>404</body></html>")["kind"] is None
    assert parse_feed("")["entries"] == []

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=120))
    def prop(s):
        parsed = parse_feed(s)
        assert parsed["kind"] in ("rss", "atom", None)
        assert isinstance(parsed["entries"], list)

    prop()

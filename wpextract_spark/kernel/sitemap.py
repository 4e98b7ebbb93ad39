"""Sitemap protocol parsing (sitemaps.org XML: urlset + sitemapindex).

Closes the discovery loop that robots.txt opens: ``Sitemap:`` lines point
at either a ``<urlset>`` of page entries (loc/lastmod/changefreq/priority)
or a ``<sitemapindex>`` of child sitemaps.  ``lastmod`` feeds the recrawl
scheduler directly (a declared modification date beats a fingerprint probe)
and ``loc`` seeds the frontier.

Parsing rides the own-built HTML tokenizer: sitemap XML is plain nested
elements with text content, which the DOM handles generically (unknown tag
names nest; ``&amp;`` entities in locs decode).  Messy real-world files —
wrong nesting, missing fields, garbage between entries — degrade per entry,
never per file.
"""

from __future__ import annotations

from typing import Any, Optional

from wpextract_spark.htmlkit.dom import Tag, parse_html

_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _child_text(entry: Tag, name: str) -> Optional[str]:
    node = entry.find(name)
    if node is None:
        return None
    text = node.get_text().strip()
    return text or None


def parse_sitemap(xml: str) -> dict[str, Any]:
    """``{"kind": "urlset"|"index"|None, "entries": [...]}``.

    Entries carry ``loc`` (entries without one are dropped — nothing to
    crawl), ``lastmod``/``changefreq`` verbatim, and ``priority`` as a
    float (unparseable values null).  For an index, entries are the child
    sitemaps (``<sitemap><loc>``), with ``lastmod`` when declared.
    """
    root = parse_html(xml)
    if root.find("urlset") is not None:
        kind, tag_name = "urlset", "url"
    elif root.find("sitemapindex") is not None:
        kind, tag_name = "index", "sitemap"
    else:
        return {"kind": None, "entries": []}
    entries = []
    for entry in root.find_all(tag_name):
        loc = _child_text(entry, "loc")
        if not loc:
            continue
        priority: Optional[float] = None
        raw_priority = _child_text(entry, "priority")
        if raw_priority is not None:
            try:
                priority = float(raw_priority)
            except ValueError:
                priority = None
        entries.append(
            {
                "loc": loc,
                "lastmod": _child_text(entry, "lastmod"),
                "changefreq": _child_text(entry, "changefreq"),
                "priority": priority,
            }
        )
    return {"kind": kind, "entries": entries}

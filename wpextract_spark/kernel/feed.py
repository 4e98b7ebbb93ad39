"""RSS 2.0 / Atom feed parsing — the third WordPress discovery channel.

Every WordPress site exposes ``/feed`` (RSS 2.0) and most themes advertise
it via ``rel=alternate``; feeds carry fresher, cleaner item metadata than
recrawling listing pages, so a crawl scheduler polls them between full
visits (titles, canonical links, publish dates — straight into the
frontier and the publish-date cascade).

Parsing rides the HTML tokenizer with ONE preprocessing step: ``<link>``
is a void element in HTML, so RSS's text-content links would leak into
sibling text nodes — the parser renames the tag to ``feedlink`` first
(attributes survive, which is all Atom's ``<link href=…/>`` needs).
Per-entry degradation as everywhere: a broken item never drops the feed.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from wpextract_spark.htmlkit.dom import Tag, parse_html

_LINK_RENAME = re.compile(r"<(/?)link(?=[\s/>])", re.IGNORECASE)
# WordPress feeds wrap titles/descriptions in CDATA, which an HTML
# tokenizer treats as a bogus comment; rewrite sections to escaped text
# (the parser's entity decoding restores the original characters).
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)


def _cdata_to_text(match: re.Match) -> str:
    inner = match.group(1)
    return (
        inner.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _child_text(entry: Tag, name: str) -> Optional[str]:
    node = entry.find(name)
    if node is None:
        return None
    text = node.get_text().strip()
    return text or None


def _entry_link(entry: Tag, atom: bool) -> Optional[str]:
    if not atom:
        return _child_text(entry, "feedlink")
    # Atom: prefer rel=alternate (or rel-less), fall back to any href.
    fallback = None
    for tag in entry.find_all("feedlink"):
        href = (tag.get("href") or "").strip()
        if not href:
            continue
        rel = (tag.get("rel") or "alternate").strip().lower()
        if rel == "alternate":
            return href
        fallback = fallback or href
    return fallback


def parse_feed(xml: str) -> dict[str, Any]:
    """``{"kind": "rss"|"atom"|None, "title": ..., "entries": [...]}``.

    Entries carry ``title``, ``link``, ``published`` (RSS ``pubDate`` /
    Atom ``published`` falling back to ``updated``) and ``guid`` (RSS
    ``guid`` / Atom ``id``) — all raw strings, nullable; entries with
    neither link nor guid are dropped (nothing to key on).
    """
    xml = _CDATA.sub(_cdata_to_text, xml)
    root = parse_html(_LINK_RENAME.sub(r"<\1feedlink", xml))
    if root.find("rss") is not None or root.find("channel") is not None:
        kind, container, item_tag = "rss", root.find("channel"), "item"
    elif root.find("feed") is not None:
        kind, container, item_tag = "atom", root.find("feed"), "entry"
    else:
        return {"kind": None, "title": None, "entries": []}
    atom = kind == "atom"
    title = _child_text(container, "title") if container is not None else None
    entries = []
    for entry in root.find_all(item_tag):
        link = _entry_link(entry, atom)
        guid = _child_text(entry, "id" if atom else "guid")
        if not link and not guid:
            continue
        published = (
            _child_text(entry, "published") or _child_text(entry, "updated")
            if atom
            else _child_text(entry, "pubdate")
        )
        entries.append(
            {
                "title": _child_text(entry, "title"),
                "link": link,
                "published": published,
                "guid": guid,
            }
        )
    return {"kind": kind, "title": title, "entries": entries}

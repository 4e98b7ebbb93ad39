"""Head-metadata extraction: title, description, Open Graph, canonical,
robots directives, declared language.

A large-crawl pipeline needs these fields long before content extraction
runs — titles/descriptions feed quality filters and search indexing,
``robots`` gates what may be kept, ``canonical`` feeds URL dedup, and the
declared ``lang`` seeds language ID. The reference reads some of these via
the WP API (``og_image_url``, ``src/wpextract/parse/translations/``) — here
they come straight from the raw page head so the operator works on any
Common-Crawl-style page, WordPress or not.

Totality contract matches the sibling kernels: any page parses to *some*
metadata row (all-null in the worst case); the Spark operator adds the
usual quarantine ``error`` column.
"""

from __future__ import annotations

from typing import Any, Optional

import re

from wpextract_spark.functions.text import attr_concat
from wpextract_spark.htmlkit.dom import Document, Tag
from wpextract_spark.kernel.selfurl import get_link_canonical

META_FIELDS = [
    "title",
    "description",
    "og_title",
    "og_image",
    "canonical",
    "robots_noindex",
    "robots_nofollow",
    "lang",
]


def _meta_content(head: Tag, attr: str, value: str) -> Optional[str]:
    # find(name=...) is the tag name in the htmlkit API, so the ``name``
    # attribute of <meta> tags has to be matched manually.
    for tag in head.find_all("meta"):
        if tag.get(attr, "").lower() == value and tag.has_attr("content"):
            return attr_concat(tag["content"])
    return None


def extract_page_meta(doc: Document) -> dict[str, Any]:
    """All head metadata in one DOM pass-set over the (small) ``<head>``.

    ``robots_noindex`` / ``robots_nofollow`` follow the REP meta-tag rules:
    comma-separated directives, case-insensitive, ``none`` implies both.
    ``lang`` is the root ``<html lang>`` attribute (empty → null).
    """
    row: dict[str, Any] = dict.fromkeys(META_FIELDS)
    row["robots_noindex"] = False
    row["robots_nofollow"] = False

    html_tag = doc.find("html")
    if html_tag is not None and html_tag.has_attr("lang"):
        lang = attr_concat(html_tag["lang"]).strip()
        row["lang"] = lang or None

    head = doc.head
    if head is None:
        return row

    title = head.find("title")
    if title is not None:
        # Titles collapse ALL whitespace runs to one space (unlike the
        # body-text squash, which is line-oriented for reference parity).
        text = re.sub(r"\s+", " ", title.get_text()).strip()
        row["title"] = text or None

    row["description"] = _meta_content(head, "name", "description")
    row["og_title"] = _meta_content(head, "property", "og:title")
    row["og_image"] = _meta_content(head, "property", "og:image")
    row["canonical"] = get_link_canonical(doc)

    robots = _meta_content(head, "name", "robots")
    if robots:
        directives = {d.strip().lower() for d in robots.split(",")}
        row["robots_noindex"] = bool({"noindex", "none"} & directives)
        row["robots_nofollow"] = bool({"nofollow", "none"} & directives)
    return row


def extract_alternates(doc: Document) -> list[dict[str, Any]]:
    """``<link rel="alternate" hreflang=...>`` pairs from the head.

    The generic-web translation-discovery channel (Google's hreflang
    protocol): WordPress multilingual plugins, and most i18n sites, declare
    every language variant here — the generalization of the reference's
    Polylang-picker scraping to arbitrary Common-Crawl pages. Order is
    document order; entries missing ``href`` are dropped (nothing to link),
    ``hreflang`` is lowercased (BCP-47 is case-insensitive), and
    ``x-default`` passes through for the fallback-variant convention.
    """
    head = doc.head
    if head is None:
        return []
    out: list[dict[str, Any]] = []
    for tag in head.find_all("link"):
        rels = (tag.get("rel") or "").lower().split()
        if "alternate" not in rels or not tag.has_attr("hreflang"):
            continue
        href = (tag.get("href") or "").strip()
        if not href:
            continue
        out.append(
            {"hreflang": attr_concat(tag["hreflang"]).strip().lower(), "href": href}
        )
    return out

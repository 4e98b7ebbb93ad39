"""Self-URL discovery for scraped pages (reference ``scrape/processor.py``).

Canonical ``<link rel="canonical">`` takes precedence over
``<meta property="og:url">``; either must be an absolute URL.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urlparse

from wpextract_spark.functions.text import attr_concat
from wpextract_spark.htmlkit.dom import Document


def _is_url_valid(url: str) -> bool:
    try:
        parsed = urlparse(url)
    except ValueError:  # e.g. malformed IPv6 bracket host — total, like the
        return False    # sibling kernels; lets the og:url fallback still run
    return bool(parsed.scheme) and bool(parsed.netloc)


def get_link_canonical(doc: Document) -> Optional[str]:
    """href of ``<link rel="canonical">`` in the head, if valid."""
    head = doc.head
    if head is None:
        return None
    link = head.find("link", rel="canonical")
    if link is None or not link.has_attr("href"):
        return None
    url = attr_concat(link["href"])
    return url if _is_url_valid(url) else None


def get_og_url(doc: Document) -> Optional[str]:
    """content of ``<meta property="og:url">`` in the head, if valid."""
    head = doc.head
    if head is None:
        return None
    meta = head.find("meta", property="og:url")
    if meta is None or not meta.has_attr("content"):
        return None
    url = attr_concat(meta["content"])
    return url if _is_url_valid(url) else None


def extract_self_url(doc: Document) -> Optional[str]:
    """The page's own URL from meta tags; canonical wins over og:url."""
    url = get_link_canonical(doc)
    if url is not None:
        return url
    return get_og_url(doc)

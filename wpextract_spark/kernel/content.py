"""The per-document content-extraction kernel.

This is the byte-parity-critical core (reference ``parse/content.py``): given
one parsed document and its canonical URL it produces, in a single DOM pass,

* the boilerplate-stripped body text (figcaption/table subtrees excluded,
  ``<p>``/``<br>`` mapped to newlines, comments skipped, whitespace squashed),
* internal/external link spans, ``<iframe>`` embeds and image spans.

Everything returns plain dicts/lists so results cross the Arrow boundary of a
``mapInPandas`` stage as native Spark ``array<struct<...>>`` values; the DOM
never leaves this function (SURVEY.md §1.1 note on fused parsing).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any, Optional
from urllib.parse import urljoin, urlparse, urlunparse

from wpextract_spark.functions.text import squash_whitespace
from wpextract_spark.htmlkit.dom import CommentNode, Tag, TextNode


@lru_cache(maxsize=4096)
def _safe_netloc(link: str) -> str:
    try:
        return urlparse(link).netloc
    except ValueError:
        return ""


#: Fast-path shape: lowercase http(s), nonempty authority, no whitespace
#: (urlsplit strips \t\r\n — those must take the slow path), not ending in a
#: bare '?'/'#' (urljoin/urlunparse drop an EMPTY trailing query/fragment).
#: For hrefs of this shape `urlunparse(urlparse(urljoin(base, href)))` is
#: href itself and the netloc is the authority group — proven by the
#: differential test in tests/test_content.py (fixtures + fuzz).
#: No brackets anywhere (urlparse raises on unbalanced '['/']' — the
#: returns-None contract), no semicolons (urlunparse drops an EMPTY params
#: segment, so 'x;' -> 'x'), \Z not $ (a $ would match before a trailing
#: newline that urlsplit strips) — all such hrefs take the slow path.
_FAST_ABS = re.compile(
    r"^(https?)://([A-Za-z0-9._~%!$&'()*+,=:@-]+)([/?#][^\s;\[\]]*)?\Z"
)


@lru_cache(maxsize=65536)
def _absolutize_slow(base: str, href: str) -> Optional[tuple[str, str]]:
    """``(urlunparse(urlparse(urljoin(base, href))), netloc)``, or None if
    unparsable. Memoized: inside a long-lived executor the same
    (page-url, href) pairs recur constantly — nav/footer links repeat on
    every page of a site — and urljoin+urlparse are ~15% of kernel time."""
    try:
        parsed = urlparse(urljoin(base, href))
    except ValueError:
        return None
    return urlunparse(parsed), parsed.netloc


def _absolutize(base: str, href: str) -> Optional[tuple[str, str]]:
    """Absolutized href + netloc; regex fast path for clean absolute URLs
    (the common case in a crawl — no urljoin, no cache traffic), urllib
    slow path for everything else."""
    m = _FAST_ABS.match(href)
    if m and href[-1] not in "?#" and "?#" not in href:
        # trailing '?'/'#' and '?#' are EMPTY query/fragment components,
        # which urlunparse drops — those go through the slow path.
        return href, m.group(2)
    return _absolutize_slow(base, href)

#: Subtrees whose text never reaches the body text (reference content.py:14).
EXCLUDED_CONTENT_TAGS = frozenset({"figcaption", "table"})
#: Tags that contribute a newline at their open position (content.py:15).
NEWLINE_TAGS = frozenset({"br", "p"})


def get_caption(img: Tag) -> Optional[str]:
    """Caption of an image: the <figcaption> of its enclosing <figure>.

    Mirrors ``extractors/media.py:100-129``.
    """
    if img.name != "img":
        raise ValueError("Attempting to get caption of non-image")
    figure = img.find_parent("figure")
    if figure is None:
        return None
    caption = figure.find("figcaption")
    if caption is None:
        return None
    return caption.get_text()


def extract_links(doc: Tag, self_link: str) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Internal and external link spans of the document.

    Semantics (reference ``parse/content.py:22-60``):

    * ``<a>`` without href -> external with null href;
    * href absolutized against ``self_link``; same netloc -> internal with the
      *absolutized* href; different netloc -> external with the *raw* href;
    * link text is the squashed text content.

    Internal links carry a ``destination`` slot (null until resolved);
    external links never have one.
    """
    internal: list[dict[str, Any]] = []
    external: list[dict[str, Any]] = []
    self_netloc = _safe_netloc(self_link)
    anchors = getattr(doc, "anchors", None)
    if anchors is None:  # non-root subtree: fall back to a tree walk
        anchors = doc.find_all("a")
    for a in anchors:
        text = squash_whitespace(a.get_text())
        if not a.has_attr("href"):
            external.append({"text": text, "href": None})
            continue
        abs_href = _absolutize(self_link, a["href"])
        if abs_href is None:
            # Unparsable href (e.g. malformed IPv6 bracket host): keep the
            # raw value as an external link rather than dropping the span.
            external.append({"text": text, "href": a["href"]})
        elif abs_href[1] == self_netloc:
            internal.append({"text": text, "href": abs_href[0], "destination": None})
        else:
            external.append({"text": text, "href": a["href"]})
    return internal, external


def extract_embeds(doc: Tag) -> list[str]:
    """``src`` of every iframe (reference ``parse/content.py:66-75``)."""
    iframes = getattr(doc, "iframes", None)
    if iframes is None:
        iframes = doc.find_all("iframe")
    return [iframe["src"] for iframe in iframes if iframe.has_attr("src")]


def extract_images(doc: Tag, self_link: str) -> list[dict[str, Any]]:
    """Image spans; same-site images are flagged resolvable.

    Mirrors ``parse/content.py:81-118``: src absolutized via urljoin; missing
    src -> ``src=""``; alt from the attr; caption from the enclosing figure.
    ``internal`` discriminates ResolvableMediaUse from MediaUse — at export
    the ``destination`` key exists only for internal uses.
    """
    out: list[dict[str, Any]] = []
    self_netloc = _safe_netloc(self_link)
    images = getattr(doc, "images", None)
    if images is None:
        images = doc.find_all("img")
    for img in images:
        alt = img.get("alt")
        caption = get_caption(img)
        if not img.has_attr("src"):
            out.append(
                {"src": "", "alt": alt, "caption": caption, "destination": None, "internal": False}
            )
            continue
        abs_src = _absolutize(self_link, img["src"])
        if abs_src is None:
            out.append(
                {"src": img["src"], "alt": alt, "caption": caption,
                 "destination": None, "internal": False}
            )
            continue
        out.append(
            {
                "src": abs_src[0],
                "alt": alt,
                "caption": caption,
                "destination": None,
                "internal": abs_src[1] == self_netloc,
            }
        )
    return out


def _walk_text(node: Tag, parts: list[str]) -> None:
    """Document-order text walk, skipping excluded subtrees.

    Equivalent to the reference's copy + ``decompose()`` + descendant walk
    (``parse/content.py:121-136, 152-162``): a tag in ``NEWLINE_TAGS``
    contributes a newline at its open position, text nodes append verbatim,
    comments are skipped, and figcaption/table subtrees are pruned whole.
    Iterative (explicit stack of child iterators): recursion depth would be
    DOM depth, and adversarial crawl pages nest arbitrarily.
    """
    append = parts.append
    stack = [iter(node.children)]
    while stack:
        for child in stack[-1]:
            if isinstance(child, TextNode):
                append(child.text)
            elif isinstance(child, Tag):
                name = child.name
                if name in EXCLUDED_CONTENT_TAGS:
                    continue
                if name in NEWLINE_TAGS:
                    append("\n")
                if child.children:
                    stack.append(iter(child.children))
                    break
            # CommentNode: skipped
        else:
            stack.pop()


def extract_text(doc: Tag) -> str:
    """Boilerplate-stripped text of the document."""
    parts: list[str] = []
    _walk_text(doc, parts)
    return squash_whitespace("".join(parts))


def extract_content(doc: Tag, self_link: str) -> dict[str, Any]:
    """Fused single-pass extraction (reference ``parse/content.py:140-164``).

    Returns a dict with keys ``text``, ``links_internal``, ``links_external``,
    ``embeds``, ``images`` — the schema of the Spark extraction stage.
    """
    internal, external = extract_links(doc, self_link)
    return {
        "text": extract_text(doc),
        "links_internal": internal,
        "links_external": external,
        "embeds": extract_embeds(doc),
        "images": extract_images(doc, self_link),
    }

"""Generic main-content selection by DOM heuristics.

north_rule coverage of the extraction tier's "DOM heuristics": the reference's
boilerplate strip (``kernel/content.py``) encodes WordPress-specific rules
(figcaption/table exclusion); a Common-Crawl corpus also contains arbitrary
non-WP pages where the main article must be *located* before it is extracted.
This module implements the classic readability-style density heuristic, kept
deliberately small and fully deterministic:

1. one bottom-up pass computes, per element, its total text length and the
   portion of that text inside links;
2. every candidate container (``article/main/section/div/td/body``) is scored
   ``own_text * (1 - link_density)`` where ``own_text = text - link_text`` —
   navigation, tag clouds, and footers have link densities near 1 and score
   near 0, article bodies score near their text length;
3. the best-scoring container (document-order-first on ties) is extracted
   with the same text walk as the WP kernel (figcaption/table exclusion,
   ``<p>``/``<br>`` newlines, whitespace squash).

All passes are iterative (no recursion): depth is bounded only by
``dom.MAX_TREE_DEPTH``, which equals CPython's default recursion limit.
"""

from __future__ import annotations

from typing import Optional

from wpextract_spark.htmlkit.dom import Tag, TextNode
from wpextract_spark.kernel.content import extract_text

#: Elements eligible to be "the main content container".
CANDIDATE_TAGS = frozenset({"article", "main", "section", "div", "td", "body"})

#: Subtrees that never contain main content; pruned before scoring so a page
#: whose best container *wraps* the nav doesn't leak menu text.
NEGATIVE_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "script", "style"})


def _text_stats(root: Tag) -> dict[int, tuple[int, int]]:
    """Per-element ``(text_len, link_text_len)`` via one post-order pass.

    Text inside :data:`NEGATIVE_TAGS` subtrees counts as link text (pure
    boilerplate), which drives the scores of containers that include them
    toward zero without a second pruning pass.
    """
    stats: dict[int, tuple[int, int]] = {}
    stack: list[tuple[Tag, bool]] = [(root, False)]
    while stack:
        node, processed = stack.pop()
        if not processed:
            stack.append((node, True))
            for child in node.children:
                if isinstance(child, Tag):
                    stack.append((child, False))
            continue
        text_len = 0
        link_len = 0
        for child in node.children:
            if isinstance(child, TextNode):
                text_len += len(child.text.strip())
            elif isinstance(child, Tag):
                c_text, c_link = stats[id(child)]
                text_len += c_text
                if child.name == "a" or child.name in NEGATIVE_TAGS:
                    link_len += c_text
                else:
                    link_len += c_link
        stats[id(node)] = (text_len, link_len)
    return stats


def select_main_container(doc: Tag) -> Optional[Tag]:
    """The best-scoring candidate container, or None for an empty page.

    Candidates inside a :data:`NEGATIVE_TAGS` subtree are excluded outright:
    the penalty applies at the boilerplate element's parent edge, so a
    text-rich div nested *inside* footer/nav would otherwise score with
    clean stats and win over the real article.
    """
    stats = _text_stats(doc)
    best: Optional[Tag] = None
    best_score = 0.0
    for tag in doc.iter_tags():
        if tag.name not in CANDIDATE_TAGS:
            continue
        ancestor = tag.parent
        inside_negative = False
        while ancestor is not None:
            if isinstance(ancestor, Tag) and ancestor.name in NEGATIVE_TAGS:
                inside_negative = True
                break
            ancestor = ancestor.parent
        if inside_negative:
            continue
        text_len, link_len = stats[id(tag)]
        if text_len <= 0:
            continue
        own = text_len - link_len
        score = own * (1.0 - link_len / text_len)
        if score > best_score:  # strict: document-order-first wins ties
            best, best_score = tag, score
    return best


def extract_main_content(doc: Tag) -> str:
    """Main-content text of an arbitrary page.

    Selects the densest container, prunes :data:`NEGATIVE_TAGS` subtrees
    inside it, and extracts text with the shared WP-kernel walk. Empty
    string when the page has no scoreable content.
    """
    best = select_main_container(doc)
    if best is None:
        return ""
    pruned = _without_negative(best)
    return extract_text(pruned)


def _without_negative(tag: Tag) -> Tag:
    """A shallow filtered view: copy of ``tag`` whose NEGATIVE_TAGS subtrees
    are dropped (iteratively, original tree untouched)."""
    root_copy = Tag(tag.name, tag.attrs)
    stack: list[tuple[Tag, Tag]] = [(tag, root_copy)]
    while stack:
        src, dst = stack.pop()
        for child in src.children:
            if isinstance(child, Tag):
                if child.name in NEGATIVE_TAGS:
                    continue
                child_copy = Tag(child.name, child.attrs)
                child_copy.parent = dst
                dst.children.append(child_copy)
                stack.append((child, child_copy))
            else:
                # Shared leaf (text/comment) — appended without touching its
                # parent pointer so the original tree stays intact.
                dst.children.append(child)
    return root_copy

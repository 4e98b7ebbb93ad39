"""A minimal, dependency-free HTML DOM for the extraction kernel.

The reference engine (wpextract, see ``/root/reference/src/wpextract/parse/html.py:10-19``)
parses HTML with BeautifulSoup+lxml. Neither library is available in this
environment, and the goal is a from-scratch engine anyway, so this module
implements the small slice of DOM behaviour the extraction kernel actually
depends on. Tokenization is the single-pass regex tokenizer in
``htmlkit.tokenize`` (~2x the stdlib ``html.parser`` throughput; the stdlib
path is kept as ``parse_html_stdlib`` and pinned equivalent by
``tests/test_htmlkit_diff.py``). The tree provides:

* a node tree with tags / text / comments and parent pointers,
* document-order descendant traversal (pre-order, tags before their children),
* ``get_text()`` that concatenates text nodes (comments excluded),
* ``find`` / ``find_all`` / ``find_parent`` with simple attribute filters,
* HTML5-style error recovery for the common WordPress malformations
  (unclosed ``<p>``/``<li>``, void elements, stray end tags).

The tree is built once per document inside an Arrow-batched pandas UDF; no DOM
object ever crosses a Spark stage boundary.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser
from typing import Optional, Union

from wpextract_spark.htmlkit.tokenize import fast_feed

#: Elements that never have children (HTML5 void elements).
VOID_ELEMENTS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)

#: Opening one of these implicitly closes an open <p> (HTML5 parsing rules;
#: matches libxml2's recovery for the structures WordPress emits).
_P_CLOSERS = frozenset(
    {
        "address",
        "article",
        "aside",
        "blockquote",
        "details",
        "dd",
        "div",
        "dl",
        "dt",
        "fieldset",
        "figcaption",
        "figure",
        "footer",
        "form",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "header",
        "hr",
        "main",
        "menu",
        "nav",
        "ol",
        "p",
        "pre",
        "section",
        "table",
        "ul",
    }
)

#: tag -> set of tags it implicitly closes when they sit at the top of the
#: open-element stack (sibling-style auto-closing).
_SIBLING_CLOSERS = {
    # A new <a> start tag implicitly closes an open <a> (HTML5 "adoption
    # agency" simplification; matches libxml2 on nested anchors, which occur
    # in real WordPress content).
    "a": frozenset({"a"}),
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
    "thead": frozenset({"tr", "td", "th"}),
    "tbody": frozenset({"tr", "td", "th", "thead"}),
    "tfoot": frozenset({"tr", "td", "th", "tbody", "thead"}),
    "colgroup": frozenset({"colgroup"}),
}

#: Scope boundaries: an implicit <p> close never crosses one of these.
_P_SCOPE_BOUNDARY = frozenset({"[document]", "html", "body", "table", "td", "th", "caption"})

#: Tags that can trigger any implicit close at all — the _implicit_close
#: early-exit gate (most tags trigger none).
_ANY_CLOSER = frozenset(_SIBLING_CLOSERS) | _P_CLOSERS

#: Maximum open-element depth. Real pages nest a few dozen levels; browsers
#: and libxml2 cap recovery-parse depth in the same order of magnitude. An
#: adversarial page (<div> x 100k) otherwise costs unbounded memory at
#: corpus scale — exceeding the cap raises, and the UDF-level quarantine
#: (operators/extract.py) routes the document to the error column.
MAX_TREE_DEPTH = 1000


class ParseDepthError(ValueError):
    """Open-element stack exceeded MAX_TREE_DEPTH (adversarial nesting)."""


class Node:
    """Base node with a parent pointer."""

    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: Optional[Tag] = None


class TextNode(Node):
    """A run of character data."""

    __slots__ = ("text",)

    def __init__(self, text: str) -> None:
        self.parent = None
        self.text = text

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TextNode({self.text!r})"


class CommentNode(Node):
    """An HTML comment. Deliberately *not* a TextNode so that text
    extraction skips it (the reference excludes ``bs4.Comment`` explicitly,
    ``parse/content.py:131-133``)."""

    __slots__ = ("text",)

    def __init__(self, text: str) -> None:
        self.parent = None
        self.text = text

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"CommentNode({self.text!r})"


class Tag(Node):
    """An element node."""

    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: Optional[dict[str, str]] = None) -> None:
        self.parent = None
        self.name = name
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Node] = []

    # -- tree access ---------------------------------------------------

    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    @property
    def descendants(self) -> Iterator[Node]:
        """All descendant nodes in document order (pre-order).

        Iterative with an explicit stack: the naive recursive generator
        chains one generator frame per tree level, turning every ``next()``
        into O(depth) resumptions — measured ~25% of total parse+extract
        time on real pages.
        """
        stack = [iter(self.children)]
        while stack:
            for node in stack[-1]:
                yield node
                if isinstance(node, Tag) and node.children:
                    stack.append(iter(node.children))
                    break
            else:
                stack.pop()

    def iter_tags(self) -> Iterator["Tag"]:
        for node in self.descendants:
            if isinstance(node, Tag):
                yield node

    # -- attribute access ----------------------------------------------

    def has_attr(self, name: str) -> bool:
        return name in self.attrs

    def get(self, name: str, default: Optional[str] = None) -> Optional[str]:
        return self.attrs.get(name, default)

    def __getitem__(self, name: str) -> str:
        return self.attrs[name]

    # -- text ------------------------------------------------------------

    def get_text(self) -> str:
        """Concatenate all text node descendants (comments excluded)."""
        parts: list[str] = []
        for node in self.descendants:
            if isinstance(node, TextNode):
                parts.append(node.text)
        return "".join(parts)

    # -- searching -------------------------------------------------------

    def _attrs_match(self, filters: dict[str, str]) -> bool:
        for key, want in filters.items():
            val = self.attrs.get(key)
            if val is None:
                return False
            if key in ("rel", "class"):
                # Multi-valued attributes: match the whole value or any token.
                if val != want and want not in val.split():
                    return False
            elif val != want:
                return False
        return True

    def find_all(self, name: Optional[str] = None, **filters: str) -> list["Tag"]:
        out = []
        for tag in self.iter_tags():
            if name is not None and tag.name != name:
                continue
            if filters and not tag._attrs_match(filters):
                continue
            out.append(tag)
        return out

    def find(self, name: Optional[str] = None, **filters: str) -> Optional["Tag"]:
        for tag in self.iter_tags():
            if name is not None and tag.name != name:
                continue
            if filters and not tag._attrs_match(filters):
                continue
            return tag
        return None

    def find_parent(self, name: str) -> Optional["Tag"]:
        node = self.parent
        while node is not None:
            if isinstance(node, Tag) and node.name == name:
                return node
            node = node.parent
        return None

    # CSS selection is provided by htmlkit.select; bound here for ergonomics.
    def select(self, selector: str) -> list["Tag"]:
        from wpextract_spark.htmlkit.select import select

        return select(self, selector)

    def select_one(self, selector: str) -> Optional["Tag"]:
        from wpextract_spark.htmlkit.select import select_one

        return select_one(self, selector)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name} {self.attrs!r} children={len(self.children)}>"


class Document(Tag):
    """Root of a parsed document.

    The builder records every ``<a>``/``<img>``/``<iframe>`` element here as
    it is constructed (document order), so the span extractors read a ready
    list instead of re-walking the whole tree once per tag kind — the walks
    were ~25% of kernel time on real pages. The lists are exactly what
    ``find_all`` on the root would return.
    """

    __slots__ = ("anchors", "images", "iframes")

    def __init__(self) -> None:
        super().__init__("[document]")
        self.anchors: list[Tag] = []
        self.images: list[Tag] = []
        self.iframes: list[Tag] = []

    @property
    def head(self) -> Optional[Tag]:
        return self.find("head")

    @property
    def body(self) -> Optional[Tag]:
        return self.find("body")


class _TreeBuilder(HTMLParser):
    """Builds the node tree with light HTML5-style recovery."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self._stack: list[Tag] = [self.root]

    # -- helpers ---------------------------------------------------------

    def _top(self) -> Tag:
        return self._stack[-1]

    def _implicit_close(self, name: str) -> None:
        if name not in _ANY_CLOSER:
            return
        # Sibling-style auto close: <li> closes an open <li>, etc.
        closers = _SIBLING_CLOSERS.get(name)
        if closers:
            while len(self._stack) > 1 and self._top().name in closers:
                self._stack.pop()
        # Block elements close an open <p> within scope.
        if name in _P_CLOSERS:
            for i in range(len(self._stack) - 1, 0, -1):
                node_name = self._stack[i].name
                if node_name in _P_SCOPE_BOUNDARY:
                    break
                if node_name == "p":
                    del self._stack[i:]
                    break

    def _append_leaf(self, node: Node) -> None:
        self._top().append(node)

    _SPAN_TAGS = frozenset({"a", "img", "iframe"})

    def _record_span_tag(self, node: Tag) -> None:
        if node.name == "img":
            self.root.images.append(node)
        elif node.name == "a":
            self.root.anchors.append(node)
        else:
            self.root.iframes.append(node)

    @staticmethod
    def _build_attrs(attrs) -> dict[str, str]:
        if type(attrs) is dict:  # fast tokenizer already built the dict
            return attrs
        out: dict[str, str] = {}
        for key, value in attrs:
            if key not in out:  # first occurrence wins, like libxml2
                out[key] = value if value is not None else ""
        return out

    # -- HTMLParser callbacks ---------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        self._implicit_close(tag)
        node = Tag(tag, attrs if type(attrs) is dict else self._build_attrs(attrs))
        top = self._stack[-1]
        node.parent = top
        top.children.append(node)
        if tag not in VOID_ELEMENTS:
            if len(self._stack) >= MAX_TREE_DEPTH:
                raise ParseDepthError(
                    f"element depth exceeds {MAX_TREE_DEPTH} at <{tag}>"
                )
            self._stack.append(node)
        if tag in self._SPAN_TAGS:
            self._record_span_tag(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # Self-closing syntax: always an empty element.
        self._implicit_close(tag)
        node = Tag(tag, attrs if type(attrs) is dict else self._build_attrs(attrs))
        self._append_leaf(node)
        if tag in self._SPAN_TAGS:
            self._record_span_tag(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # Pop to the nearest matching open tag; ignore stray end tags.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            node = TextNode(data)
            top = self._stack[-1]
            node.parent = top
            top.children.append(node)

    def handle_comment(self, data: str) -> None:
        self._append_leaf(CommentNode(data))

    def updatepos(self, i: int, j: int) -> int:
        # HTMLParser tracks line/offset solely for error reporting; the
        # kernel never reads positions, and the scan is ~5% of parse time.
        return j

    # DOCTYPE, processing instructions and unknown declarations carry no
    # extractable content.
    def handle_decl(self, decl: str) -> None:  # pragma: no cover - trivial
        pass

    def handle_pi(self, data: str) -> None:  # pragma: no cover - trivial
        pass

    def unknown_decl(self, data: str) -> None:  # pragma: no cover - trivial
        pass


def parse_html_stdlib(html: Union[str, bytes], head_only: bool = False) -> Document:
    """Reference tokenizer path (stdlib HTMLParser). Kept as the differential
    oracle for the fast tokenizer (tests/test_htmlkit_diff.py)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    if head_only:
        html = _truncate_to_head(html)
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


_HEAD_CLOSE_RE = re.compile(r"</head\s*>", re.IGNORECASE)


def _truncate_to_head(html: str) -> str:
    # A real close tag only — a bare find("</head") would false-match the
    # prefix of "</header>" and cut mid-body.
    m = _HEAD_CLOSE_RE.search(html)
    if m is not None:
        return html[: m.end()]
    # No head close tag: a <body> open tag also ends the head.
    cut = html.lower().find("<body")
    if cut != -1:
        return html[:cut]
    return html


def parse_html(html: Union[str, bytes], head_only: bool = False) -> Document:
    """Parse an HTML document or fragment into a :class:`Document`.

    Args:
        html: the document source. Bytes are decoded as UTF-8 (errors
            replaced), matching how crawl payloads are stored.
        head_only: if True, stop feeding the parser after ``</head>`` — the
            analog of the reference's ``SoupStrainer(["head", "link", "meta"])``
            fast path for self-URL discovery (``scrape/crawler.py:90-94``),
            which avoids building a DOM for megabyte bodies.

    Returns:
        The parsed document root.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")

    if head_only:
        html = _truncate_to_head(html)

    builder = _TreeBuilder()
    fast_feed(builder, html)
    return builder.root

"""HTML → Markdown rendering over the own-built DOM.

LLM training pipelines increasingly keep document STRUCTURE (headings,
lists, tables, code blocks) instead of flattening pages to plain text —
structure tokens are cheap and models learn layout from them.  This kernel
renders a parsed page to deterministic CommonMark-flavored Markdown in one
DOM pass.  It is a structural renderer, not a boilerplate stripper: run it
on the content subtree that :mod:`wpextract_spark.kernel.content` (or the
main-content heuristic) selects.

Rendering rules (chosen for determinism, not round-tripping):

* ``h1``–``h6`` → ``#``…``######``; ``p`` → paragraph; ``hr`` → ``---``;
  ``br`` → newline within the block;
* ``ul``/``ol`` → ``-`` / ``1.`` items, nested lists indented two spaces
  per level, ordered markers numbered per level;
* ``blockquote`` → every line prefixed ``> `` (nested quotes stack);
* ``pre`` → fenced code block with RAW text (no whitespace squashing);
* ``table`` → pipe table; the first row supplies the header (CommonMark
  tables require one), ``|`` in cells escaped;
* inline: ``a`` → ``[text](href)``, ``img`` → ``![alt](src)``,
  ``strong``/``b`` → ``**``, ``em``/``i`` → ``*``, inline ``code`` →
  backticks; unknown inline tags contribute their children transparently;
* ``script``/``style``/``template``/``noscript``/``head`` and comments are
  dropped; whitespace inside flow content is squashed exactly like the
  text kernel (``functions/text.py::squash_whitespace``).

Blocks are joined with one blank line.  Total on any tree the tokenizer
produces (fuzz-tested); never raises on missing attributes.
"""

from __future__ import annotations

import re

from wpextract_spark.htmlkit.dom import Tag, TextNode

# HTML flow-content whitespace: any run collapses to one space.  (The text
# kernel's squash_whitespace is the reference's newline-squash for plain
# text extraction — Markdown needs the HTML rendering rule instead.)
_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_ANY_WS_RUN = re.compile(r"\s+")


def _collapse_line(text: str) -> str:
    return _WS_RUN.sub(" ", text).strip()


def _collapse(text: str) -> str:
    return _ANY_WS_RUN.sub(" ", text).strip()

_SKIP = {"script", "style", "template", "noscript", "head"}
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_WRAP = {"strong": "**", "b": "**", "em": "*", "i": "*"}
# Elements that open their own block context when met in flow.
_BLOCK = {"p", "div", "section", "article", "main", "ul", "ol", "blockquote",
          "pre", "table", "hr", "figure", "aside"} | set(_HEADINGS)


def _inline(node) -> str:
    """Flow content of ``node`` as Markdown inline text (unsquashed)."""
    if isinstance(node, TextNode):
        return node.text
    if not isinstance(node, Tag):
        return ""  # comments
    name = node.name
    if name in _SKIP:
        return ""
    if name == "br":
        return "\n"
    if name == "img":
        return "![{}]({})".format(
            _collapse(node.get("alt", "") or ""), node.get("src", "") or ""
        )
    inner = "".join(_inline(child) for child in node.children)
    if name == "a":
        return "[{}]({})".format(inner, node.get("href", "") or "")
    if name == "code":
        return "`{}`".format(inner)
    wrap = _WRAP.get(name)
    if wrap and inner.strip():
        return "{0}{1}{0}".format(wrap, inner.strip())
    return inner


def _squash_block(text: str) -> str:
    # collapse each line, keep intentional <br> newlines, drop empty lines.
    lines = [_collapse_line(line) for line in text.split("\n")]
    return "\n".join(line for line in lines if line)


def _list_items(tag: Tag, ordered: bool, depth: int) -> list[str]:
    out = []
    idx = 0
    indent = "  " * depth
    for child in tag.children:
        if not (isinstance(child, Tag) and child.name == "li"):
            continue
        idx += 1
        marker = "{}.".format(idx) if ordered else "-"
        flow_parts: list[str] = []
        nested: list[str] = []
        for sub in child.children:
            if isinstance(sub, Tag) and sub.name in ("ul", "ol"):
                nested.extend(_list_items(sub, sub.name == "ol", depth + 1))
            else:
                flow_parts.append(_inline(sub))
        body = _squash_block("".join(flow_parts)) or ""
        out.append("{}{} {}".format(indent, marker, body).rstrip())
        out.extend(nested)
    return out


def _own_rows(tag: Tag) -> list[Tag]:
    """The table's OWN rows: direct ``tr`` children plus ``tr`` children of
    direct ``thead``/``tbody``/``tfoot`` children. A recursive find_all
    would hoist rows of a table nested inside a cell into the outer pipe
    table — duplicating them (they also render inline inside the cell) and
    corrupting the outer column count."""
    rows: list[Tag] = []
    for child in tag.children:
        if not isinstance(child, Tag):
            continue
        if child.name == "tr":
            rows.append(child)
        elif child.name in ("thead", "tbody", "tfoot"):
            rows.extend(
                tr
                for tr in child.children
                if isinstance(tr, Tag) and tr.name == "tr"
            )
    return rows


def _table(tag: Tag) -> str:
    rows: list[list[str]] = []
    for tr in _own_rows(tag):
        cells = [
            _collapse(_inline(cell)).replace("|", "\\|")
            for cell in tr.children
            if isinstance(cell, Tag) and cell.name in ("td", "th")
        ]
        if cells:
            rows.append(cells)
    if not rows:
        return ""
    rendered = ["| {} |".format(" | ".join(cells)) for cells in rows]
    sep = "|{}".format(" --- |" * len(rows[0]))
    return "\n".join([rendered[0], sep] + rendered[1:])


def _blocks(tag: Tag, out: list[str]) -> None:
    """Append the Markdown blocks of ``tag``'s children to ``out``."""
    flow: list[str] = []

    def flush() -> None:
        block = _squash_block("".join(flow))
        if block:
            out.append(block)
        flow.clear()

    for child in tag.children:
        name = child.name if isinstance(child, Tag) else None
        if name is None or name not in _BLOCK:
            if name in _SKIP:
                continue
            flow.append(_inline(child))
            continue
        flush()
        if name in _HEADINGS:
            text = _collapse(_inline(child))
            if text:
                out.append("{} {}".format("#" * _HEADINGS[name], text))
        elif name == "hr":
            out.append("---")
        elif name in ("ul", "ol"):
            items = _list_items(child, name == "ol", 0)
            if items:
                out.append("\n".join(items))
        elif name == "blockquote":
            inner: list[str] = []
            _blocks(child, inner)
            if inner:
                quoted = "\n\n".join(inner)
                out.append(
                    "\n".join("> " + line if line else ">" for line in quoted.split("\n"))
                )
        elif name == "pre":
            raw = child.get_text()
            out.append("```\n{}\n```".format(raw.strip("\n")))
        elif name == "table":
            rendered = _table(child)
            if rendered:
                out.append(rendered)
        else:  # p, div, section, … — recurse for nested blocks
            _blocks(child, out)
    flush()


def render_markdown(root: Tag) -> str:
    """Markdown for ``root``'s subtree (pass a document's body or a
    selected content container)."""
    body = root.find("body") or root
    out: list[str] = []
    _blocks(body, out)
    return "\n\n".join(out)

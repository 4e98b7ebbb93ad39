"""A tiny CSS selector engine over :mod:`wpextract_spark.htmlkit.dom`.

Supports exactly the selector features the language-picker plugin API uses
(reference picker selectors at ``parse/translations/_pickers.py:196-263``):

* type selectors (``a``, ``li``), ``*``
* class selectors (``.lang-item``), compounded (``.lang-item.current-lang``)
* id selectors (``#polylang``)
* attribute selectors: presence ``[lang]`` and exact value ``[rel=alternate]``
  / ``[rel="alternate"]`` (the reference's pickers select ``a[lang]``,
  ``_pickers.py:196-221``)
* ``:not(<compound>)``
* descendant combinator (whitespace) and child combinator (``>``)

Matching semantics follow CSS/soupsieve: ``select(context, sel)`` returns
strict descendants of ``context`` in document order; ancestor compounds may
match any ancestor up to the document root.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional

from wpextract_spark.htmlkit.dom import Tag

_TOKEN = re.compile(
    r"""
    (?P<name>[a-zA-Z][a-zA-Z0-9_-]*|\*)
  | \.(?P<cls>[a-zA-Z0-9_-]+)
  | \#(?P<id>[a-zA-Z0-9_-]+)
  | \[(?P<attr>[a-zA-Z_][a-zA-Z0-9_-]*)
      (?:=(?P<aval>"[^"]*"|'[^']*'|[^\]]*))?\]
  | :not\((?P<not>[^)]*)\)
    """,
    re.VERBOSE,
)


@dataclass
class _Compound:
    name: Optional[str] = None
    classes: frozenset[str] = field(default_factory=frozenset)
    id: Optional[str] = None
    #: (attr_name, required_value_or_None-for-presence) pairs
    attrs: tuple[tuple[str, Optional[str]], ...] = ()
    nots: tuple["_Compound", ...] = ()


class SelectorError(ValueError):
    pass


def _parse_compound(text: str) -> _Compound:
    name: Optional[str] = None
    classes: set[str] = set()
    tag_id: Optional[str] = None
    attrs: list[tuple[str, Optional[str]]] = []
    nots: list[_Compound] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            raise SelectorError(f"Unsupported selector syntax at {text[pos:]!r}")
        if m.group("name"):
            if pos != 0:
                raise SelectorError(f"Type selector must come first in {text!r}")
            if m.group("name") != "*":
                name = m.group("name").lower()
        elif m.group("cls"):
            classes.add(m.group("cls"))
        elif m.group("id"):
            tag_id = m.group("id")
        elif m.group("attr"):
            value = m.group("aval")
            if value is not None and value[:1] in "\"'" and value[:1] == value[-1:]:
                value = value[1:-1]
            attrs.append((m.group("attr").lower(), value))
        else:
            nots.append(_parse_compound(m.group("not").strip()))
        pos = m.end()
    return _Compound(
        name=name, classes=frozenset(classes), id=tag_id,
        attrs=tuple(attrs), nots=tuple(nots),
    )


def _split_selector(selector: str) -> list[str]:
    """Split into compound tokens and ``'>'`` combinator markers.

    Whitespace and ``>`` inside ``[...]`` — including quoted attribute
    values like ``[alt="a > b"]`` — are literal, so this is a small scanner
    rather than a str.split (which would mangle them)."""
    tokens: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: Optional[str] = None
    for ch in selector:
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            buf.append(ch)
            quote = ch
        elif ch == "[":
            depth += 1
            buf.append(ch)
        elif ch == "]":
            depth = max(depth - 1, 0)
            buf.append(ch)
        elif depth == 0 and ch == ">":
            if buf:
                tokens.append("".join(buf))
                buf = []
            tokens.append(">")
        elif depth == 0 and ch.isspace():
            if buf:
                tokens.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        tokens.append("".join(buf))
    return tokens


@lru_cache(maxsize=512)
def _parse_selector(selector: str) -> tuple[tuple[str, _Compound], ...]:
    """Parse into (combinator, compound) pairs; the first combinator is
    always the descendant combinator relative to the context node.

    Memoized: the picker UDFs evaluate the same constant selector strings
    once per document across the whole corpus."""
    parts: list[tuple[str, _Compound]] = []
    combinator = " "
    for token in _split_selector(selector):
        if token == ">":
            if not parts:
                raise SelectorError(f"Selector cannot start with '>': {selector!r}")
            combinator = ">"
            continue
        parts.append((combinator, _parse_compound(token)))
        combinator = " "
    if combinator == ">":
        raise SelectorError(f"Dangling '>' in selector: {selector!r}")
    if not parts:
        raise SelectorError(f"Empty selector: {selector!r}")
    return tuple(parts)


def _classes_of(tag: Tag) -> frozenset[str]:
    raw = tag.attrs.get("class")
    if not raw:
        return frozenset()
    return frozenset(raw.split())


def _match_compound(tag: Tag, comp: _Compound) -> bool:
    if comp.name is not None and tag.name != comp.name:
        return False
    if comp.classes and not comp.classes <= _classes_of(tag):
        return False
    if comp.id is not None and tag.attrs.get("id") != comp.id:
        return False
    for attr_name, want in comp.attrs:
        got = tag.attrs.get(attr_name)
        if got is None:
            return False
        if want is not None and got != want:
            return False
    for neg in comp.nots:
        if _match_compound(tag, neg):
            return False
    return True


def _match_chain(tag: Tag, parts: list[tuple[str, _Compound]], idx: int) -> bool:
    """``parts[idx]`` matched at ``tag``; check the earlier compounds against
    the ancestor chain."""
    if idx == 0:
        return True
    combinator, _ = parts[idx]
    prev_comp = parts[idx - 1][1]
    parent = tag.parent
    if combinator == ">":
        return (
            isinstance(parent, Tag)
            and _match_compound(parent, prev_comp)
            and _match_chain(parent, parts, idx - 1)
        )
    node = parent
    while isinstance(node, Tag):
        if _match_compound(node, prev_comp) and _match_chain(node, parts, idx - 1):
            return True
        node = node.parent
    return False


def select(context: Tag, selector: str) -> list[Tag]:
    """All strict descendants of ``context`` matching ``selector``, in
    document order."""
    parts = _parse_selector(selector)
    last = parts[-1][1]
    out: list[Tag] = []
    for tag in context.iter_tags():
        if _match_compound(tag, last) and _match_chain(tag, parts, len(parts) - 1):
            out.append(tag)
    return out


def select_one(context: Tag, selector: str) -> Optional[Tag]:
    """First match of ``selector`` under ``context`` or None."""
    parts = _parse_selector(selector)
    last = parts[-1][1]
    for tag in context.iter_tags():
        if _match_compound(tag, last) and _match_chain(tag, parts, len(parts) - 1):
            return tag
    return None

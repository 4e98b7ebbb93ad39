"""Scalar text functions of the extraction kernel.

Pure Python on purpose: the whitespace-squash semantics are defined by Python
``re`` (reference ``util/str.py:106-120``), and running them inside the
Arrow-batched UDFs keeps byte parity with the reference fixtures. Java
``regexp_replace`` is deliberately NOT used here — Java and Python regex
semantics differ at corners (``\\s`` coverage, multiline anchoring), which is
a parity risk flagged in SURVEY.md §2.2 P10.
"""

from __future__ import annotations

import re

from wpextract_spark.htmlkit.dom import parse_html

_ADJACENT_NEWLINES = re.compile("\n{2,}")
_LINE_LEADING_WS = re.compile(r"^\s+", re.MULTILINE)

#: Fast-path probe: a string without '<' or an entity-like sequence is not
#: HTML and is returned verbatim (unsquashed!) — reference ``parse/html.py:7,34-35``.
PROBABLY_HTML = re.compile(r"<|&\S+;")


def squash_whitespace(string: str) -> str:
    """Collapse runs of newlines, strip line-leading whitespace, trim ends.

    Because ``\\s`` matches newlines, the multiline leading-whitespace pass
    also swallows whitespace-only lines entirely (pinned by the reference's
    own tests: ``tests/util/test_str.py`` squash cases).
    """
    return _LINE_LEADING_WS.sub("", _ADJACENT_NEWLINES.sub("\n", string)).strip()


def extract_html_text(html: str) -> str:
    """Text of an HTML fragment; non-HTML strings pass through untouched.

    Mirrors ``parse/html.py:22-37``: the fast path returns the raw string
    (notably *without* squashing), otherwise parse + get_text + squash.
    """
    if PROBABLY_HTML.search(html) is None:
        return html
    return squash_whitespace(parse_html(html).get_text())


def remove_prefix(text: str, prefix: str) -> str:
    return text[len(prefix) :] if text.startswith(prefix) else text


def remove_suffix(text: str, suffix: str) -> str:
    return text[: -len(suffix)] if suffix and text.endswith(suffix) else text


def remove_ends(text: str, affix: str) -> str:
    """Strip ``affix`` from both ends if present."""
    return remove_prefix(remove_suffix(text, affix), affix)


def ensure_prefix(text: str, prefix: str) -> str:
    return text if text.startswith(prefix) else prefix + text


def ensure_prefixes(text: str, prefixes: tuple[str, ...], default: str) -> str:
    return text if text.startswith(prefixes) else default + text


def ensure_suffix(text: str, suffix: str) -> str:
    return text if text.endswith(suffix) else text + suffix


def attr_concat(val) -> str:
    """Join multi-valued attribute lists with a space; pass strings through."""
    if isinstance(val, list):
        return " ".join(val)
    return val

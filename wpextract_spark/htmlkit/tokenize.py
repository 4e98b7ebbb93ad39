"""Single-pass regex tokenizer driving the DOM builder.

Emits the same token stream as the stdlib
``html.parser.HTMLParser(convert_charrefs=True)`` for well-formed and
commonly-malformed HTML, but recognizes each complete tag with ONE compiled
regex match instead of the stdlib's multi-pass scan (prefilter + whole-tag
locator + name + attrs), which makes parsing the dominant cost of the
extraction kernel ~2x cheaper. The token-level grammar (tag name / attribute
/ end-tag / comment / declaration recovery rules) deliberately matches the
stdlib tokenizer, whose patterns implement the WHATWG HTML5 tokenization
rules; equivalence is pinned by a differential test against the stdlib
builder over the golden fixtures, the synthetic corpus, and generated soup
(``tests/test_htmlkit_diff.py``).

Known intentional divergences, all on pathological input only:

* a malformed start tag that is emitted as character data is never
  entity-unescaped here (the stdlib unescapes it on some recovery paths and
  not others);
* character data recovered around unterminated constructs may be split into
  different runs (the concatenated text is identical);
* ``<![foo]>`` (unknown marked-section keyword) is consumed as a bogus
  comment, where the stdlib raises ``NotImplementedError`` — totality over
  arbitrary crawl bytes matters more than emulating a crash.

The ``sink`` is any object with the builder callback surface
(``handle_starttag/handle_startendtag/handle_endtag/handle_data/
handle_comment``); see ``htmlkit.dom._TreeBuilder``.
"""

from __future__ import annotations

import re
from html import unescape

# One match per complete tag. The attrs body admits any run of non-quote,
# non-'>' characters or balanced quoted spans (quoted attribute values may
# contain '>'), so the terminating '>' found here is the same one the
# stdlib's whole-tag locator finds for every input with balanced quotes;
# unbalanced-quote tags fail this pattern and take _slow_starttag.
_TAG = re.compile(
    r"<(?:"
    r"(?P<start>[a-zA-Z][^\t\n\r\f />\x00]*)"
    r"(?P<attrs>(?:[^>\"']|\"[^\"]*\"|'[^']*')*)>"
    r"|/\s*(?P<endname>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"  # well-formed end tag
    r"|(?P<end>/)"
    r"|(?P<comment>!--)"
    r"|(?P<pi>\?)"
    r"|(?P<decl>!)"
    r")"
)

# The stdlib tokenizer's sub-grammars (html/parser.py; WHATWG tokenization
# states) — reproduced so token boundaries are bit-identical.
_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_LOCATE_STARTTAG_END = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENTCLOSE = re.compile(r"--\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKEDCLOSE = re.compile(r"]\s*]\s*>")
_MSMARKEDCLOSE = re.compile(r"]\s*>")
# Raw-text close patterns — exactly the stdlib's set_cdata_mode pattern
# (r'</\s*%s\s*>' with re.I): a junk close like '</style x=y>' does NOT end
# raw-text mode, and unterminated raw text swallows to end of input.
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _recover(sink, rawdata: str, i: int) -> int:
    """Unterminated construct: consume to the next '>' (or '<', or one char)
    and emit the span as unescaped data — the stdlib's end-of-input recovery."""
    k = rawdata.find(">", i + 1)
    if k < 0:
        k = rawdata.find("<", i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    sink.handle_data(unescape(rawdata[i:k]))
    return k


def _emit_starttag(sink, rawdata: str, i: int, endpos: int):
    """The stdlib ``parse_starttag`` body for the tag span [i, endpos).

    Returns ``(new_pos, cdata_elem)``; ``cdata_elem`` is 'script'/'style'
    when raw-text content mode must follow.
    """
    match = _TAGFIND.match(rawdata, i + 1)
    k = match.end()
    tag = match.group(1).lower()
    # First occurrence wins on duplicate attribute names (libxml2 behavior,
    # see dom._TreeBuilder._build_attrs); valueless attrs map to "".
    attrs: dict = {}
    while k < endpos:
        am = _ATTRFIND.match(rawdata, k)
        if am is None:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = unescape(attrvalue)
        attrname = attrname.lower()
        if attrname not in attrs:
            attrs[attrname] = attrvalue if attrvalue is not None else ""
        k = am.end()
    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        # Bogus content inside the tag: the whole span is character data
        # (raw — the stdlib does not unescape on this path).
        sink.handle_data(rawdata[i:endpos])
        return endpos, None
    if end == "/>":
        sink.handle_startendtag(tag, attrs)
        return endpos, None
    sink.handle_starttag(tag, attrs)
    if tag in _CDATA_CLOSE:
        return endpos, tag
    return endpos, None


def _slow_starttag(sink, rawdata: str, i: int) -> int:
    """'<'+letter positions the fast pattern rejects (unbalanced quotes,
    truncated tags): the stdlib ``check_for_whole_start_tag`` decision."""
    j = _LOCATE_STARTTAG_END.match(rawdata, i).end()
    nxt = rawdata[j : j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/" and rawdata.startswith("/>", j):
        endpos = j + 2
    elif nxt == "" or nxt == "/" or nxt == "=" or nxt in _ASCII_LETTERS:
        # End of input in or before an attribute value.
        return _recover(sink, rawdata, i)
    else:
        endpos = j if j > i else i + 1
    pos, cdata_elem = _emit_starttag(sink, rawdata, i, endpos)
    if cdata_elem is not None:
        return _cdata(sink, rawdata, pos, cdata_elem)
    return pos


def _cdata(sink, rawdata: str, i: int, elem: str) -> int:
    """script/style raw-text content mode. Text is emitted verbatim (no
    charref conversion) until a PROPER matching end tag (``</elem\\s*>``);
    a junk close like ``</style x=y>`` does not end raw-text mode, and
    everything after an unclosed script/style is swallowed — exactly the
    stdlib's cdata-mode semantics."""
    m = _CDATA_CLOSE[elem].search(rawdata, i)
    if m is None:
        return len(rawdata)  # unterminated: remaining data is dropped
    if i < m.start():
        sink.handle_data(rawdata[i : m.start()])
    sink.handle_endtag(elem)
    return m.end()


def _parse_endtag(sink, rawdata: str, i: int) -> int:
    gt = rawdata.find(">", i + 1)
    if gt < 0:
        return _recover(sink, rawdata, i)
    m = _ENDTAGFIND.match(rawdata, i)
    if m is not None:
        sink.handle_endtag(m.group(1).lower())
        return gt + 1
    nm = _TAGFIND.match(rawdata, i + 2)
    if nm is None:
        if rawdata[i : i + 3] == "</>":
            return i + 3
        sink.handle_comment(rawdata[i + 2 : gt])  # bogus comment
        return gt + 1
    # Junk between the name and '>' is consumed and ignored.
    sink.handle_endtag(nm.group(1).lower())
    gt2 = rawdata.find(">", nm.end())
    return gt2 + 1


def _parse_decl(sink, rawdata: str, i: int) -> int:
    """'<!' constructs other than comments: doctype, marked sections, bogus
    comments. None contribute extractable content; boundaries must match."""
    if rawdata[i : i + 3] == "<![":
        nm = _DECLNAME.match(rawdata, i + 3)
        name = nm.group().strip().lower() if nm is not None else None
        if name in ("temp", "cdata", "ignore", "include", "rcdata"):
            cm = _MARKEDCLOSE.search(rawdata, i + 3)
        elif name in ("if", "else", "endif"):
            cm = _MSMARKEDCLOSE.search(rawdata, i + 3)
        else:
            cm = None
            gt = rawdata.find(">", i + 2)
            if gt >= 0:
                sink.handle_comment(rawdata[i + 2 : gt])
                return gt + 1
        if cm is None:
            return _recover(sink, rawdata, i)
        return cm.end()
    if rawdata[i : i + 9].lower() == "<!doctype":
        gt = rawdata.find(">", i + 9)
        if gt < 0:
            return _recover(sink, rawdata, i)
        return gt + 1
    gt = rawdata.find(">", i + 2)
    if gt < 0:
        return _recover(sink, rawdata, i)
    sink.handle_comment(rawdata[i + 2 : gt])  # bogus comment
    return gt + 1


def fast_feed(sink, rawdata: str) -> None:
    """Tokenize ``rawdata`` in one pass, driving ``sink``'s callbacks."""
    n = len(rawdata)
    i = 0
    find = rawdata.find
    handle_data = sink.handle_data
    while i < n:
        j = find("<", i)
        if j < 0:
            handle_data(unescape(rawdata[i:]))
            return
        if i < j:
            handle_data(unescape(rawdata[i:j]))
        i = j
        m = _TAG.match(rawdata, i)
        if m is not None:
            g = m.group
            if g("start") is not None:
                attrstr = g("attrs")
                if not attrstr or (stripped := attrstr.strip()) == "":
                    # No attributes (the most common tags: <p>, <div>, …).
                    tag = g("start").lower()
                    sink.handle_starttag(tag, {})
                    i = m.end()
                    if tag in _CDATA_CLOSE:
                        i = _cdata(sink, rawdata, i, tag)
                elif stripped == "/" and attrstr.endswith("/"):
                    # Self-closing ONLY when the slash is contiguous with '>'
                    # (stdlib: end == '/>'); '<div / >' is a plain start tag.
                    sink.handle_startendtag(g("start").lower(), {})
                    i = m.end()
                else:
                    i, cdata_elem = _emit_starttag(sink, rawdata, i, m.end())
                    if cdata_elem is not None:
                        i = _cdata(sink, rawdata, i, cdata_elem)
            elif g("endname") is not None:
                sink.handle_endtag(g("endname").lower())
                i = m.end()
            elif g("end") is not None:
                i = _parse_endtag(sink, rawdata, i)
            elif g("comment") is not None:
                cm = _COMMENTCLOSE.search(rawdata, i + 4)
                if cm is None:
                    i = _recover(sink, rawdata, i)
                else:
                    sink.handle_comment(rawdata[i + 4 : cm.start()])
                    i = cm.end()
            elif g("pi") is not None:
                gt = find(">", i + 2)
                if gt < 0:
                    i = _recover(sink, rawdata, i)
                else:
                    i = gt + 1  # processing instructions carry no content
            else:  # decl
                i = _parse_decl(sink, rawdata, i)
            continue
        c = rawdata[i + 1 : i + 2]
        if c in _ASCII_LETTERS:
            i = _slow_starttag(sink, rawdata, i)
        elif i + 1 < n:
            handle_data("<")
            i += 1
        else:
            handle_data("<")
            return

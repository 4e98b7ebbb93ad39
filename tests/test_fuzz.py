"""Property/fuzz tests: the kernel is total over arbitrary input.

At corpus scale the parser sees every malformation the web can produce;
these properties guarantee no input (not just fixture-shaped input) can
raise out of the pure functions the UDFs wrap (the UDF-level quarantine in
operators/extract.py is the second line of defense, for resource-exhaustion
failures like recursion bombs).
"""

from hypothesis import given, settings, strategies as st

from wpextract_spark.functions.locale import extract_locale
from wpextract_spark.functions.text import extract_html_text, squash_whitespace
from wpextract_spark.htmlkit.dom import parse_html
from wpextract_spark.kernel.content import extract_content
from wpextract_spark.kernel.linkresolve import candidate_hrefs
from wpextract_spark.kernel.selfurl import extract_self_url

# Fragment soup that leans into HTML metacharacters and unicode.
_fragments = st.one_of(
    st.text(max_size=20),
    st.sampled_from(
        ["<p>", "</p>", "<a href=", "<img src=", "<br/>", "<!--", "-->",
         "<figure>", "<figcaption>", "<table>", "<iframe src=", "&amp;",
         "&#x27;", "<![CDATA[", "<?php", "</", "<a", '="', "<", ">", "&",
         '"', "'", "=", "/", "\t\n\r"]
    ),
)
htmlish = st.lists(_fragments, max_size=30).map("".join)

urlish = st.lists(
    st.one_of(
        st.text(max_size=10),
        st.sampled_from(
            ["https://", "http://", "example.org", "/", "?", "#", "%",
             ":", "@", "[", "]", "..", "preview_id=9", "fr/", "cat/slug/"]
        ),
    ),
    max_size=12,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(htmlish)
def test_parse_and_extract_total(html):
    doc = parse_html(html)
    out = extract_content(doc, "https://example.org/x/")
    assert out["text"] is None or isinstance(out["text"], str)
    for key in ("links_internal", "links_external", "embeds", "images"):
        assert isinstance(out[key], list)


@settings(max_examples=300, deadline=None)
@given(htmlish)
def test_self_url_total(html):
    res = extract_self_url(parse_html(html, head_only=True))
    assert res is None or isinstance(res, str)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_squash_idempotent(text):
    once = squash_whitespace(text)
    assert squash_whitespace(once) == once


@settings(max_examples=300, deadline=None)
@given(htmlish)
def test_html_text_total(html):
    assert isinstance(extract_html_text(html), str)


@settings(max_examples=300, deadline=None)
@given(urlish)
def test_locale_total(url):
    res = extract_locale(url)
    assert res is None or isinstance(res, str)


@settings(max_examples=300, deadline=None)
@given(urlish)
def test_candidate_hrefs_total(href):
    cands = candidate_hrefs(href)
    assert isinstance(cands, list)
    assert all(isinstance(c, str) for c in cands)


def test_self_closing_requires_contiguous_slash():
    """'<div / >' is a plain start tag (stdlib: only end == '/>' self-closes)."""
    from wpextract_spark.htmlkit.dom import parse_html

    doc = parse_html("<a / >text</a>")
    a = doc.find("a")
    assert a.get_text() == "text"


def test_junk_style_close_stays_in_rawtext():
    """A junk close like </style x='y'> does not end raw-text mode; an
    unterminated style swallows to end of input (stdlib parity)."""
    from wpextract_spark.htmlkit.dom import parse_html

    doc = parse_html("<style>abc</style x='y'>def<p>gone</p>")
    assert doc.find("p") is None  # everything stayed inside the style
    doc2 = parse_html("<style>abc</style >def<p>kept</p>")
    assert doc2.find("p").get_text() == "kept"


def test_head_truncation_ignores_header_tag():
    """head_only truncation must not cut at '</header'."""
    from wpextract_spark.htmlkit.dom import parse_html

    html = (
        '<html><head><link rel="canonical" href="https://x.org/p/"></head-missing'
        "<body><header>big body</header>" + "<p>junk</p>" * 5 + "</body></html>"
    )
    # no </head>: must cut at <body>, not inside </header>
    doc = parse_html(html, head_only=True)
    assert doc.find("header") is None


def test_attribute_selector_values_with_space_and_gt():
    """Quoted attribute values containing ' ' or '>' are literal, not
    combinators."""
    from wpextract_spark.htmlkit.dom import parse_html

    doc = parse_html('<div><img alt="a > b"/><img alt="a b"/><img alt="c"/></div>')
    assert len(doc.select('[alt="a > b"]')) == 1
    assert len(doc.select('[alt="a b"]')) == 1
    assert len(doc.select('div > [alt="c"]')) == 1

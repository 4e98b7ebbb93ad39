"""DOM-heuristics main-content selection (kernel/maincontent.py)."""

from wpextract_spark.htmlkit.dom import parse_html
from wpextract_spark.kernel.maincontent import (
    extract_main_content,
    select_main_container,
)

ARTICLE = (
    "The quick brown fox jumps over the lazy dog. "
    "Analytics engines favor declarative plans over imperative loops. "
    "Partition pruning and predicate pushdown keep scans cheap."
)


def _page(body: str) -> str:
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


def test_article_beats_nav_and_footer():
    html = _page(
        "<nav>"
        + "".join(f'<a href="/m{i}">menu {i}</a>' for i in range(15))
        + f"</nav><main><article><p>{ARTICLE}</p></article></main>"
        + '<footer><a href="/a">about</a> <a href="/b">contact</a> legal text</footer>'
    )
    assert extract_main_content(parse_html(html)) == ARTICLE


def test_link_farm_rejected():
    html = _page(
        '<div class="cloud"><p>'
        + " ".join(f'<a href="/t{i}">a much longer tag label {i}</a>' for i in range(30))
        + f"</p></div><div id='c'><p>{ARTICLE}</p></div>"
    )
    assert extract_main_content(parse_html(html)) == ARTICLE


def test_negative_subtrees_pruned_inside_winner():
    html = _page(
        f"<div id='page'><nav><a href='/x'>inner menu</a></nav>"
        f"<p>{ARTICLE}</p>"
        f"<aside>related posts junk</aside></div>"
    )
    out = extract_main_content(parse_html(html))
    assert out == ARTICLE
    assert "inner menu" not in out and "related" not in out


def test_wp_exclusions_still_apply():
    html = _page(
        f"<main><p>{ARTICLE}</p>"
        "<table><tr><td>data grid chrome</td></tr></table>"
        "<figure><img src='/i.png'/><figcaption>cap text</figcaption></figure></main>"
    )
    out = extract_main_content(parse_html(html))
    assert out == ARTICLE
    assert "data grid" not in out and "cap text" not in out


def test_paragraph_newlines_preserved():
    html = _page(f"<article><p>first para</p><p>second para</p></article>")
    assert extract_main_content(parse_html(html)) == "first para\nsecond para"


def test_empty_and_all_link_pages():
    assert extract_main_content(parse_html(_page(""))) == ""
    assert select_main_container(parse_html("")) is None
    only_links = _page('<div><a href="/x">one</a><a href="/y">two</a></div>')
    # score is 0 everywhere -> no container clears the bar
    assert extract_main_content(parse_html(only_links)) == ""


def test_plain_body_falls_back_to_body():
    doc = parse_html(_page(f"just body prose with no wrappers. {ARTICLE}"))
    best = select_main_container(doc)
    assert best is not None and best.name == "body"
    assert ARTICLE in extract_main_content(doc)


def test_negative_ancestor_candidates_excluded(spark=None):
    """A text-rich div nested inside footer must not beat the real article."""
    from wpextract_spark.htmlkit.dom import parse_html
    from wpextract_spark.kernel.maincontent import extract_main_content

    html = (
        "<html><body><article><p>the real article text of the page</p></article>"
        "<footer><div><p>"
        + "long legal boilerplate text repeated " * 20
        + "</p></div></footer></body></html>"
    )
    assert extract_main_content(parse_html(html)) == "the real article text of the page"

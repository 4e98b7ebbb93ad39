"""HTML→Markdown kernel: feature goldens, edge cases, fuzz totality."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wpextract_spark.htmlkit import parse_html
from wpextract_spark.kernel.markdown import render_markdown


def md(html: str) -> str:
    return render_markdown(parse_html(html))


def test_headings():
    assert md("<h1>A</h1><h3>B  c</h3>") == "# A\n\n### B c"


def test_paragraph_inline():
    assert (
        md("<p>x <strong>b</strong> <em>i</em> <code>c()</code></p>")
        == "x **b** *i* `c()`"
    )


def test_links_and_images():
    assert md('<p><a href="/u">t</a> <img src="i.png" alt="alt  x"></p>') == (
        "[t](/u) ![alt x](i.png)"
    )
    assert md("<p><a>no href</a></p>") == "[no href]()"


def test_nested_lists():
    got = md("<ul><li>a</li><li>b<ol><li>c</li><li>d</li></ol></li></ul>")
    assert got == "- a\n- b\n  1. c\n  2. d"


def test_blockquote_nesting():
    assert md("<blockquote><p>a</p><p>b</p></blockquote>") == "> a\n>\n> b"
    assert (
        md("<blockquote><blockquote><p>deep</p></blockquote></blockquote>")
        == "> > deep"
    )


def test_pre_keeps_raw_whitespace():
    assert md("<pre>  a   b\n    c</pre>") == "```\n  a   b\n    c\n```"


def test_table_with_pipe_escape():
    got = md("<table><tr><th>a</th><th>b|c</th></tr><tr><td>1</td><td>2</td></tr></table>")
    assert got == "| a | b\\|c |\n| --- | --- |\n| 1 | 2 |"


def test_nested_table_rows_not_hoisted():
    # A table inside a cell renders inline within that cell; its rows must
    # not ALSO appear as rows of the outer pipe table.
    got = md(
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td><table><tr><td>inner</td></tr></table></td><td>o2</td></tr>"
        "</table>"
    )
    assert got == "| h1 | h2 |\n| --- | --- |\n| inner | o2 |"
    assert got.count("inner") == 1


def test_table_section_rows_kept():
    got = md(
        "<table><thead><tr><th>a</th></tr></thead>"
        "<tbody><tr><td>1</td></tr><tr><td>2</td></tr></tbody>"
        "<tfoot><tr><td>t</td></tr></tfoot></table>"
    )
    assert got == "| a |\n| --- |\n| 1 |\n| 2 |\n| t |"


def test_hr_br():
    assert md("<p>a<br>b</p><hr>") == "a\nb\n\n---"


def test_script_style_comments_dropped():
    assert md("<p>a<script>x()</script><!-- c --><style>p{}</style>b</p>") == "ab"


def test_div_flow_and_empty():
    assert md("<div><p>p1</p>tail</div>") == "p1\n\ntail"
    assert md("") == ""
    assert md("<p>   </p>") == ""


def test_emphasis_trims_but_keeps_spacing():
    assert md("<p>x <strong> b </strong> y</p>") == "x **b** y"


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_total_on_arbitrary_input(s):
    out = render_markdown(parse_html(s))
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["<p>", "</p>", "<ul>", "<li>", "</ul>", "<table>", "<tr>", "<td>",
             "<blockquote>", "</blockquote>", "<pre>", "</pre>", "<h2>", "</h2>",
             "text", "<strong>", "</strong>", "<br>", "<hr>", "<a href='u'>",
             "</a>", "&amp;", "<!-- c -->"]
        ),
        max_size=25,
    )
)
def test_total_on_malformed_tag_soup(parts):
    out = render_markdown(parse_html("".join(parts)))
    assert isinstance(out, str)

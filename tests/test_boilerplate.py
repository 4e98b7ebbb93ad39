"""Host-scoped template boilerplate removal."""

import pytest

from wpextract_spark.operators.boilerplate import strip_site_boilerplate


def _rows(spark, rows):
    return spark.createDataFrame(rows, ["host", "doc_id", "text"])


def test_template_lines_stripped_promo_kept(spark):
    nav, foot = "Nav | Home", "Copyright Acme"
    pages = _rows(
        spark,
        [
            ("a.com", 1, f"{nav}\nunique one\nPROMO\n{foot}"),
            ("a.com", 2, f"{nav}\nunique two\n{foot}"),
            ("a.com", 3, f"{nav}\nunique three\nPROMO\n{foot}"),
            ("a.com", 4, f"{nav}\nunique four\n{foot}"),
            ("a.com", 5, f"{nav}\nunique five\n{foot}"),
        ],
    )
    got = {r.doc_id: r for r in strip_site_boilerplate(pages).collect()}
    assert got[1].text_clean == "unique one\nPROMO"
    assert got[2].text_clean == "unique two"
    assert (got[1].n_lines, got[1].n_kept) == (4, 2)
    # PROMO is on 2/5 pages (0.4 < 0.6): content, not template.
    assert "PROMO" in got[3].text_clean


def test_normalization_case_and_trim(spark):
    pages = _rows(
        spark,
        [
            ("a.com", 1, "  NAV HOME  \nbody a"),
            ("a.com", 2, "nav home\nbody b"),
        ],
    )
    got = {r.doc_id: r.text_clean for r in strip_site_boilerplate(pages).collect()}
    assert got == {1: "body a", 2: "body b"}


def test_hosts_are_independent(spark):
    pages = _rows(
        spark,
        [
            ("a.com", 1, "shared nav\nbody a1"),
            ("a.com", 2, "shared nav\nbody a2"),
            ("b.com", 3, "shared nav\nbody b"),  # only once on b.com
        ],
    )
    got = {r.doc_id: r.text_clean for r in strip_site_boilerplate(pages).collect()}
    assert got[1] == "body a1"
    assert got[3] == "shared nav\nbody b"  # b.com has 1 page < min_pages


def test_intra_page_repeats_count_once(spark):
    # 'x' appears 3 times on ONE page out of 3: df=1/3, never template.
    pages = _rows(
        spark,
        [
            ("a.com", 1, "x\nx\nx\nbody one"),
            ("a.com", 2, "body two"),
            ("a.com", 3, "body three"),
        ],
    )
    got = {r.doc_id: r.text_clean for r in strip_site_boilerplate(pages).collect()}
    assert got[1] == "x\nx\nx\nbody one"


def test_blank_lines_never_template(spark):
    pages = _rows(
        spark,
        [
            ("a.com", 1, "a\n\nb"),
            ("a.com", 2, "c\n\nd"),
        ],
    )
    got = {r.doc_id: r.text_clean for r in strip_site_boilerplate(pages).collect()}
    assert got[1] == "a\n\nb"


def test_fully_templated_page_yields_empty(spark):
    pages = _rows(
        spark,
        [
            ("a.com", 1, "same"),
            ("a.com", 2, "same"),
        ],
    )
    got = {r.doc_id: r for r in strip_site_boilerplate(pages).collect()}
    assert got[1].text_clean == ""
    assert (got[1].n_lines, got[1].n_kept) == (1, 0)


def test_plan_no_window_no_python(spark):
    pages = _rows(spark, [("a.com", 1, "x\ny"), ("a.com", 2, "x\nz")])
    out = strip_site_boilerplate(pages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan

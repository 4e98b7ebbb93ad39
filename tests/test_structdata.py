"""JSON-LD structured-data kernel."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wpextract_spark.htmlkit import parse_html
from wpextract_spark.kernel.structdata import extract_jsonld, jsonld_summary

LD = '<script type="application/ld+json">%s</script>'


def _summary(html: str) -> dict:
    return jsonld_summary(extract_jsonld(parse_html(html)))


def test_graph_envelope_flattened():
    html = LD % (
        '{"@context":"x","@graph":[{"@type":"WebSite"},'
        '{"@type":"Article","headline":"H"}]}'
    )
    objs = extract_jsonld(parse_html(html))
    assert [o.get("@type") for o in objs] == ["WebSite", "Article"]


def test_top_level_array_and_type_list():
    s = _summary(LD % '[{"@type":["Article","BlogPosting"],"headline":"A"}]')
    assert s["types"] == ["Article", "BlogPosting"]
    assert s["headline"] == "A"


def test_malformed_block_skipped_not_poisoning():
    html = (LD % "{nope") + (LD % '{"@type":"Thing"}')
    assert _summary(html)["types"] == ["Thing"]


def test_author_shapes():
    assert _summary(LD % '{"author":"Bare Name"}')["author"] == "Bare Name"
    assert (
        _summary(LD % '{"author":{"@type":"Person","name":"Obj"}}')["author"]
        == "Obj"
    )
    assert (
        _summary(LD % '{"author":[{"noname":1},{"name":"ListHit"}]}')["author"]
        == "ListHit"
    )
    assert _summary(LD % '{"author":{"name":""}}')["author"] is None


def test_non_jsonld_scripts_ignored():
    html = '<script>var a={"@type":"Fake"};</script>' + (LD % '{"@type":"Real"}')
    assert _summary(html)["types"] == ["Real"]


def test_type_mime_matching_is_lenient():
    html = '<script type=" Application/LD+JSON ">{"@type":"T"}</script>'
    assert _summary(html)["types"] == ["T"]


def test_first_value_wins_and_dedup_types():
    html = (LD % '{"@type":"Article","headline":"first"}') + (
        LD % '{"@type":"Article","headline":"second","datePublished":"D"}'
    )
    s = _summary(html)
    assert s["types"] == ["Article"]
    assert s["headline"] == "first"
    assert s["date_published"] == "D"


def test_empty_and_scalar_payloads():
    assert _summary("") == {
        "types": [],
        "headline": None,
        "date_published": None,
        "author": None,
    }
    assert _summary(LD % '"just a string"')["types"] == []
    assert _summary(LD % "[1, 2]")["types"] == []


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=150))
def test_total_on_arbitrary_script_payloads(payload):
    html = LD % payload
    out = jsonld_summary(extract_jsonld(parse_html(html)))
    assert isinstance(out["types"], list)

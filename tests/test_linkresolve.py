"""Link-resolution parity tests (golden semantics from the reference's
tests/extractors/data/test_link_resolver.py).

The skipped reference tests document deliberate NON-features (relative links,
trailing-slash normalization) — asserted here as negatives so nobody "fixes"
them."""

from wpextract_spark.kernel.linkresolve import (
    candidate_hrefs,
    category_heuristic_href,
    preview_stripped_href,
    resolve_against_map,
)


def _registry(*urls):
    return {
        url: {"link": url, "data_type": "post", "idx": i + 1}
        for i, url in enumerate(urls)
    }


def _link(href):
    return {"text": "test", "href": href, "destination": None}


def test_link_resolver_exact():
    reg = _registry("https://example.org/post1", "https://example.or/post2")
    out = resolve_against_map(_link("https://example.org/post1"), reg)
    assert out["destination"] == reg["https://example.org/post1"]


def test_link_resolver_not_found():
    reg = _registry("https://example.org/post1")
    out = resolve_against_map(_link("https://example.org/post2"), reg)
    assert out["destination"] is None


def test_link_resolver_preview_page():
    reg = _registry("https://example.org/post1")
    href = "https://example.org/post1?preview_id=1234&preview_nonce=3ec34d434&preview=true"
    out = resolve_against_map(_link(href), reg)
    assert out["destination"] == reg["https://example.org/post1"]


def test_category_slug_removed():
    reg = _registry("https://example.org/a-test-article/")
    out = resolve_against_map(_link("https://example.org/news/a-test-article/"), reg)
    assert out["destination"] == reg["https://example.org/a-test-article/"]


def test_category_slug_removed_with_lang():
    reg = _registry("https://example.org/fr/a-test-article/")
    out = resolve_against_map(_link("https://example.org/fr/news/a-test-article/"), reg)
    assert out["destination"] == reg["https://example.org/fr/a-test-article/"]


def test_non_features_stay_unresolved():
    # Relative links are NOT resolved (reference skipped-TODO).
    reg = _registry("https://example.org/post1")
    assert resolve_against_map(_link("/post1"), reg)["destination"] is None
    # Trailing-slash variants are NOT normalized.
    reg2 = _registry("https://example.org/with/")
    assert resolve_against_map(_link("https://example.org/with"), reg2)["destination"] is None


def test_candidate_keys():
    assert candidate_hrefs(None) == []
    assert candidate_hrefs("https://example.org/a/") == ["https://example.org/a/"]
    assert candidate_hrefs("https://example.org/cat/slug/") == [
        "https://example.org/cat/slug/",
        "https://example.org/slug/",
    ]
    assert preview_stripped_href("https://x.org/p?preview_id=1") == "https://x.org/p"
    # Existing destination and null href are skipped.
    already = {"text": None, "href": "https://example.org/a", "destination": {"link": "x", "data_type": "post", "idx": 9}}
    assert resolve_against_map(already, _registry("https://example.org/a")) == already
    assert resolve_against_map(_link(None), {})["destination"] is None
    # Four path segments: heuristic not applicable.
    assert category_heuristic_href("https://example.org/a/b/c/d/") is None

"""Locale-kernel parity tests (golden values from the reference's
tests/util/test_locale.py and tests/parse/translations/test_resolver.py)."""

import pytest

from wpextract_spark.functions.locale import extract_locale, normalize_tag, tag_is_valid


@pytest.mark.parametrize(
    ("url", "expected"),
    [
        ("https://example.org", None),
        ("https://example.org/fr", "fr"),
        ("https://example.org/fr/slug", "fr"),
        ("https://example.org/fr-FR/slug", "fr-FR"),
        ("https://example.org/fr-fr/slug", "fr-FR"),
        ("https://example.org/tag/my-tag", None),
        ("https://example.org/fr/tag/my-tag", "fr"),
        ("https://example.org/don-t-let-ukraine-join-nato/", None),
    ],
)
def test_lang_extract(url, expected):
    assert extract_locale(url) == expected


@pytest.mark.parametrize(
    ("input_lang", "expected"),
    [
        ("en", "en"),
        ("en-GB", "en-GB"),
        ("fr-FR", "fr-FR"),
        ("zho", "zh"),
        ("en-gb", "en-GB"),
    ],
)
def test_normalize(input_lang, expected):
    assert normalize_tag(input_lang) == expected


def test_validity():
    assert tag_is_valid("en")
    assert tag_is_valid("fr-FR")
    assert tag_is_valid("zh-Hans-CN")
    # Extension-bearing slugs parse but extract_locale rejects them.
    assert tag_is_valid("don-t-let-ukraine-join-nato")
    assert not tag_is_valid("news")
    assert not tag_is_valid("category")
    assert not tag_is_valid("2024")
    assert not tag_is_valid("don-t")  # dangling singleton


def test_simplify_and_macro():
    assert normalize_tag("en-Latn", simplify_script=True) == "en"
    assert normalize_tag("cmn", prefer_macrolanguage=True) == "zh"
    assert normalize_tag("ru-Cyrl", simplify_script=True) == "ru"
    assert normalize_tag("en-Cyrl", simplify_script=True) == "en-Cyrl"

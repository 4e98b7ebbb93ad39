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


def test_grandfathered_tags_normalize():
    """RFC 5646 grandfathered tags map to their preferred values (langcodes
    standardize_tag behaviour)."""
    from wpextract_spark.functions.locale import normalize_tag, tag_is_valid

    assert normalize_tag("i-klingon") == "tlh"
    assert normalize_tag("art-lojban") == "jbo"
    assert normalize_tag("no-bok") == "nb"
    assert normalize_tag("no-nyn") == "nn"
    assert normalize_tag("zh-min-nan") == "nan"
    assert normalize_tag("zh-guoyu") == "cmn"
    assert normalize_tag("zh-guoyu", prefer_macrolanguage=True) == "zh"
    assert normalize_tag("i-navajo") == "nv"
    assert normalize_tag("sgn-BE-FR") == "sfb"
    assert normalize_tag("en-GB-oed") == "en-GB-oxendict"
    # No preferred value: stays valid, round-trips unchanged.
    assert tag_is_valid("i-default")
    assert normalize_tag("i-default") == "i-default"
    # Not grandfathered, not parseable.
    assert not tag_is_valid("i-notreal")


def test_extlang_tags_normalize():
    """Extended-language subtags replace their macrolanguage prefix
    (zh-cmn-Hans -> cmn-Hans; with macrolanguage preference -> zh-Hans)."""
    from wpextract_spark.functions.locale import normalize_tag, tag_is_valid

    assert normalize_tag("zh-cmn") == "cmn"
    assert normalize_tag("zh-cmn-Hans") == "cmn-Hans"
    assert normalize_tag("zh-cmn-Hans", prefer_macrolanguage=True) == "zh-Hans"
    assert normalize_tag("zh-yue") == "yue"
    assert tag_is_valid("ar-arb")
    assert normalize_tag("ms-zsm") == "zsm"


def test_extlang_requires_registered_prefix():
    """An extlang is only valid under its registered prefix: 'xx-yue' must
    stay invalid, not launder into 'yue'."""
    from wpextract_spark.functions.locale import normalize_tag, tag_is_valid

    assert not tag_is_valid("xx-yue")
    assert not tag_is_valid("qq-cmn-Hans")
    assert not tag_is_valid("en-cmn")
    assert not tag_is_valid("de-arb")
    assert normalize_tag("zh-yue") == "yue"
    assert tag_is_valid("sgn-ase")


def test_full_registry_breadth():
    """The generated iso-codes tables give langcodes-equivalent validity for
    tags <= 3 subtags: any registered ISO 639-3/-5 code parses, unregistered
    strings don't, private-use qaa..qtz is valid by construction."""
    from wpextract_spark.functions.iso639_data import ISO639_3, TO_PART1
    from wpextract_spark.functions.locale import tag_is_valid

    assert len(ISO639_3) > 8000  # full registry, not a curated subset
    # Exotic but registered codes a curated table would miss.
    for code in ("aaa", "zzj", "tzm", "nod", "kjg", "ber", "gem", "don"):
        assert tag_is_valid(code), code
    # Unregistered / syntactically-3-letter garbage stays invalid.
    for code in ("zzz", "qux", "abq-xx-999-zz", "xyz"):
        # zzz/xyz genuinely unregistered; qux is in the private-use range
        if code == "qux":
            continue
        assert not tag_is_valid(code), code
    # Private use range (RFC 5646): qaa..qtz valid by construction; outside
    # the range only registered codes pass (qua is Quechua-family, qzz isn't
    # anything).
    assert tag_is_valid("qaa") and tag_is_valid("qtz") and tag_is_valid("qkx")
    assert tag_is_valid("qua")
    assert not tag_is_valid("qzz")
    # Bibliographic aliases normalize like langcodes: fre -> fr, ger -> de.
    from wpextract_spark.functions.locale import normalize_tag

    assert TO_PART1["fre"] == "fr"
    assert normalize_tag("fre-FR") == "fr-FR"
    assert normalize_tag("ger") == "de"
    assert normalize_tag("tib") == "bo"


def test_full_script_registry():
    from wpextract_spark.functions.locale import tag_is_valid

    # Scripts a curated list missed (all ISO 15924-registered).
    for tag in ("en-Adlm", "sr-Cyrl-RS", "uz-Aran", "ff-Adlm-GN"):
        assert tag_is_valid(tag), tag
    assert not tag_is_valid("en-Qqqq-")
    assert not tag_is_valid("en-Abcd")  # unregistered script


def test_locale_sniff_registered_exotics():
    """URL segments that are registered 3-letter languages sniff as locales;
    lookalike slugs don't."""
    from wpextract_spark.functions.locale import extract_locale

    # yue is NOT macrolanguage-smushed (CLDR keeps Cantonese distinct; only
    # cmn/arb/zsm-style aliases collapse), cmn is.
    assert extract_locale("https://example.org/yue/post/") == "yue"
    assert extract_locale("https://example.org/cmn/post/") == "zh"
    assert extract_locale("https://example.org/fil/post/") == "fil"
    assert extract_locale("https://example.org/hmn/post/") == "hmn"
    assert extract_locale("https://example.org/xyz/post/") is None

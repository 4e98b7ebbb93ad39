"""Picker parity tests (golden values from the reference's
tests/parse/translations/test_pickers.py + test_extractor.py, same fixtures)."""

from pathlib import Path

import pytest

from wpextract_spark.htmlkit import parse_html
from wpextract_spark.kernel.translations import (
    ExtractionFailedError,
    PolylangCustomDropdown,
    PolylangWidget,
    extract_translations,
)

DATA = Path(__file__).parent / "data" / "translations"


@pytest.mark.parametrize(
    ("picker_cls", "picker_file"),
    [
        (PolylangWidget, "polylang_widget.html"),
        (PolylangCustomDropdown, "polylang_custom_dropdown.html"),
    ],
)
def test_picker(picker_cls, picker_file):
    doc = parse_html((DATA / picker_file).read_text())
    picker = picker_cls(doc)
    assert picker.matches()
    picker.extract()
    assert len(picker.translations) == 1
    # Current language: "en-US" for the widget, "en" for the dropdown — both
    # have language (base subtag) "en".
    assert picker.current_language.split("-")[0] == "en"
    assert picker.translations[0] == {
        "text": None,
        "href": "https://example.org/fr/translation-page/",
        "destination": None,
        "lang": "fr-FR",
    }


class FaultyExtractPickerSelect(PolylangWidget):
    def extract(self):
        self._root_select(".not-a-real-element")


class FaultyExtractPickerSelectOne(PolylangWidget):
    def extract(self):
        self._root_select_one(".not-a-real-element")


@pytest.mark.parametrize("picker_cls", [FaultyExtractPickerSelect, FaultyExtractPickerSelectOne])
def test_picker_extract_error(picker_cls):
    doc = parse_html((DATA / "polylang_widget.html").read_text())
    picker = picker_cls(doc)
    assert picker.matches()
    with pytest.raises(ExtractionFailedError):
        picker.extract()


@pytest.fixture()
def parsed_page():
    return parse_html((DATA / "polylang_widget.html").read_text())


def test_extract_translations(parsed_page):
    lang, translations = extract_translations(
        parsed_page, "https://example.org/current-lang-page/", None
    )
    assert lang == "en-US"
    assert len(translations) == 1


def test_none_matching(parsed_page):
    lang, translations = extract_translations(
        parsed_page,
        "https://example.org/current-lang-page/",
        translation_pickers=[PolylangCustomDropdown],
    )
    assert lang is None
    assert translations == []


class FaultyDummyPicker(PolylangWidget):
    def extract(self):
        raise self._build_extraction_fail_err(".dummy")


def test_error_extracting(parsed_page):
    lang, translations = extract_translations(
        parsed_page,
        "https://example.org/current-lang-page/",
        translation_pickers=[FaultyDummyPicker],
    )
    assert lang is None
    assert translations == []


def test_doc_is_none():
    lang, translations = extract_translations(
        None, "https://example.org/current-lang-page/", None
    )
    assert lang is None
    assert translations == []


def test_attribute_selectors():
    """[attr] presence and [attr=value] selectors (reference pickers use
    a[lang], _pickers.py:196-221) — the custom-picker plugin surface."""
    from wpextract_spark.htmlkit.dom import parse_html

    doc = parse_html(
        '<ul><li class="lang-item current-lang"><a lang="fr" href="/fr/">fr</a></li>'
        '<li class="lang-item"><a href="/de/">de</a></li></ul>'
        '<link rel="alternate" hreflang="en" href="/en/"/>'
    )
    assert [a["lang"] for a in doc.select("a[lang]")] == ["fr"]
    assert doc.select_one(".lang-item.current-lang a[lang]")["href"] == "/fr/"
    assert len(doc.select("[rel=alternate]")) == 1
    assert len(doc.select('[rel="alternate"]')) == 1
    assert len(doc.select("a[lang=fr]")) == 1
    assert doc.select("a[lang=de]") == []
    # presence requires the attribute, not just the tag
    assert doc.select_one(".lang-item:not(.current-lang) a[lang]") is None

"""Language-picker plugin API + built-in Polylang pickers.

Re-expresses the reference's extension surface
(``parse/translations/_pickers.py``, ``_extractor.py``) over our own DOM.
Custom pickers subclass :class:`LangPicker`; picker classes are closed over
by the Spark pandas UDF and shipped to executors with ``--py-files``.

Translation links are plain dicts ``{text, href, destination, lang}`` so they
cross the Arrow boundary as ``array<struct>``.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from typing import Any, Optional

from wpextract_spark.functions.locale import normalize_tag
from wpextract_spark.functions.text import attr_concat, squash_whitespace
from wpextract_spark.htmlkit.dom import Document, Tag


class ExtractionFailedError(Exception):
    """A picker matched but an expected element was missing."""


class LangPicker(ABC):
    """Abstract language-picker. Subclass and implement ``get_root`` and
    ``extract``; register via the ``translation_pickers`` pipeline option."""

    def __init__(self, page_doc: Document) -> None:
        self.page_doc = page_doc
        self.root_el: Optional[Tag] = None
        self.translations: list[dict[str, Any]] = []
        self.current_language: Optional[str] = None

    def matches(self) -> bool:
        """True if this picker's root element exists on the page."""
        root = self.get_root()
        if root is None:
            return False
        if isinstance(root, Tag):
            self.root_el = root
            return True
        raise TypeError(f"Root is not a tag, is {type(root)}")

    @abstractmethod
    def get_root(self) -> Optional[Tag]:
        """Locate the picker's root element, or None if absent."""

    @abstractmethod
    def extract(self) -> None:
        """Populate ``current_language`` and ``translations``.

        Raises:
            ExtractionFailedError: if an expected element is missing.
        """

    def set_current_lang(self, lang: str) -> None:
        """Record the page language (normalized BCP-47)."""
        self.current_language = normalize_tag(lang) or lang

    def add_translation(self, href: str, lang: str) -> None:
        """Record a translation link with its raw language code."""
        self.translations.append(
            {"text": None, "href": href, "destination": None, "lang": lang}
        )

    def _build_extraction_fail_err(self, selector: str) -> ExtractionFailedError:
        return ExtractionFailedError(
            f"{self.__class__.__name__} reported it could extract but failed "
            f"to select element with: {selector}"
        )

    def _root_select(self, selector: str) -> list[Tag]:
        els = self.root_el.select(selector)
        if len(els) == 0:
            raise self._build_extraction_fail_err(selector)
        return els

    def _root_select_one(self, selector: str) -> Tag:
        el = self.root_el.select_one(selector)
        if el is None:
            raise self._build_extraction_fail_err(selector)
        return el


class PolylangWidget(LangPicker):
    """The Polylang plugin's widget-style picker (``.widget_polylang``).

    Current language from the first ``.lang-item.current-lang a`` — exactly
    the reference selector (``_pickers.py:210``): if that anchor lacks a
    ``lang`` attribute this raises KeyError, where the reference also fails;
    the UDF-level quarantine (operators/extract.py) turns that into a no-doc
    result instead of a task failure. Translations from ``.lang-item``
    entries that are neither ``.no-translation`` (links to a language
    homepage, not a translation) nor ``.current-lang``.
    """

    def get_root(self) -> Optional[Tag]:
        return self.page_doc.select_one(".widget_polylang")

    def extract(self) -> None:
        current = self._root_select_one(".lang-item.current-lang a")
        self.set_current_lang(attr_concat(current["lang"]))
        for a in self.root_el.select(".lang-item:not(.no-translation):not(.current-lang) a"):
            self.add_translation(attr_concat(a["href"]), attr_concat(a["lang"]))


class PolylangCustomDropdown(LangPicker):
    """An in-the-wild Polylang dropdown variant (``.header-lang_switcher``).

    Current language from the ``.current-lang-switcher`` text; translations
    from non-``.no-translation`` ``.lang-item`` links.
    """

    def get_root(self) -> Optional[Tag]:
        return self.page_doc.select_one(".header-lang_switcher")

    def extract(self) -> None:
        current = self._root_select_one(".current-lang-switcher")
        self.set_current_lang(squash_whitespace(current.get_text()))
        for a in self.root_el.select(".lang-item:not(.no-translation) a"):
            self.add_translation(attr_concat(a["href"]), attr_concat(a["lang"]))


DEFAULT_PICKERS: list[type[LangPicker]] = [PolylangWidget, PolylangCustomDropdown]


def extract_translations(
    page_doc: Optional[Document],
    link: str,
    translation_pickers: Optional[list[type[LangPicker]]] = None,
) -> tuple[Optional[str], list[dict[str, Any]]]:
    """Language + translation links of a page via the first matching picker.

    Dispatch semantics (reference ``_extractor.py:13-51``): first picker whose
    ``matches()`` hits wins; an ``ExtractionFailedError`` logs a warning and
    stops (returns none); no match returns ``(None, [])``.
    """
    if translation_pickers is None:
        translation_pickers = DEFAULT_PICKERS
    if page_doc is None:
        return None, []
    for picker_class in translation_pickers:
        picker = picker_class(page_doc)
        if not picker.matches():
            continue
        try:
            picker.extract()
        except ExtractionFailedError as e:
            logging.warning(e)
            break
        return picker.current_language, picker.translations
    logging.debug('No translation pickers matched "%s", unable to extract translations.', link)
    return None, []

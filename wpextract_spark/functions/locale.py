"""A small, self-contained BCP-47 implementation.

The reference uses the ``langcodes`` package (``util/locale.py``,
``parse/translations/_resolver.py:23``); that package is not available here,
so this module implements the subset of behaviour the pipeline depends on:

* syntactic parsing + registry validation of simple tags
  (language[-script][-region][-variants][-extensions]),
* normalization: ISO 639-2/3 -> 639-1 mapping, deprecated-tag replacement,
  case canonicalization,
* ``prefer_macrolanguage`` (e.g. ``cmn`` -> ``zh``),
* ``simplify_script`` (drop a script that is the language's default,
  e.g. ``en-Latn`` -> ``en``).

The language/script registry is the FULL public table, generated from the
Debian ``iso-codes`` registry into ``iso639_data.py`` (8,045 three-letter
codes: ISO 639-3 + 639-5 collections + bibliographic aliases; all ISO 15924
scripts) — the same data behind the IANA language-subtag-registry that
langcodes validates against. Remaining divergence from langcodes: IANA
redundant/deprecated compound tags outside the grandfathered list, and
4-subtag-plus exotica; every tag of <= 3 subtags built from registered
subtags validates identically.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urlparse

from wpextract_spark.functions.iso639_data import (
    ISO639_1 as _GEN_ISO639_1,
    ISO639_3 as _ISO639_3_ALL,
    SCRIPTS as _GEN_SCRIPTS,
    TO_PART1 as _ISO639_3_TO_1,
)
from wpextract_spark.functions.text import remove_ends

# All ISO 639-1 alpha-2 codes; 'bh' (Bihari, an IANA-registered collective)
# is absent from the generated 639-3-derived table.
_ISO639_1 = _GEN_ISO639_1 | {"bh"}

# RFC 5646 private-use language range qaa..qtz is valid by construction.
_PRIVATE_LANG = re.compile(r"^q[a-t][a-z]$")

# Macrolanguage preference (langcodes Language.prefer_macrolanguage()).
_MACROLANGUAGE = {
    "cmn": "zh", "yue": "yue",  # yue has no preferred macrolanguage mapping in practice
    "arb": "ar", "apd": "ar", "zsm": "ms", "pes": "fa", "ekk": "et", "lvs": "lv",
    "knn": "kok", "npi": "ne", "ory": "or", "swh": "sw", "uzn": "uz", "azj": "az",
    "plt": "mg", "quz": "qu", "als": "sq",
}

# Deprecated tags replaced during normalization (langcodes normalize=True).
_DEPRECATED = {
    "iw": "he", "in": "id", "ji": "yi", "mo": "ro", "jw": "jv", "sh": "sr-Latn",
}

# ISO 15924 script codes the validator recognizes (full generated registry).
_SCRIPTS = _GEN_SCRIPTS

# Default (suppress-script / likely) script per language, for simplify_script.
_DEFAULT_SCRIPT = {
    # Latin-script languages (Suppress-Script: Latn in the IANA registry)
    **{lang: "latn" for lang in (
        "af ca cs cy da de en es et eu fi fo fr fy ga gl gv hr hu id is it la lb lt lv ms mt "
        "nb nl nn no pl pt rm ro sk sl sq sv sw tl tr vi eo ha ht ay gn jv rn rw sm sn so ss "
        "st su tn to ts xh yo zu".split()
    )},
    "ru": "cyrl", "uk": "cyrl", "be": "cyrl", "bg": "cyrl", "mk": "cyrl", "mn": "cyrl",
    "ar": "arab", "fa": "arab", "ur": "arab", "ps": "arab",
    "he": "hebr", "yi": "hebr",
    "el": "grek", "hy": "armn", "ka": "geor",
    "hi": "deva", "mr": "deva", "ne": "deva", "sa": "deva",
    "bn": "beng", "as": "beng", "pa": "guru", "gu": "gujr", "or": "orya",
    "ta": "taml", "te": "telu", "kn": "knda", "ml": "mlym", "si": "sinh",
    "th": "thai", "lo": "laoo", "my": "mymr", "km": "khmr",
    "ko": "kore", "ja": "jpan", "zh": "hans", "am": "ethi", "ti": "ethi", "bo": "tibt",
    "dz": "tibt",
}

_ALPHA = re.compile(r"^[a-zA-Z]+$")
_DIGITS = re.compile(r"^[0-9]+$")
_ALNUM = re.compile(r"^[a-zA-Z0-9]+$")


class ParsedTag:
    """A parsed BCP-47 tag."""

    __slots__ = ("language", "script", "region", "variants", "extensions", "private")

    def __init__(
        self,
        language: str,
        script: Optional[str],
        region: Optional[str],
        variants: list[str],
        extensions: list[str],
        private: list[str],
    ) -> None:
        self.language = language
        self.script = script
        self.region = region
        self.variants = variants
        self.extensions = extensions
        self.private = private

    def to_tag(self) -> str:
        parts = [self.language]
        if self.script:
            parts.append(self.script.title())
        if self.region:
            parts.append(self.region.upper())
        parts.extend(self.variants)
        parts.extend(self.extensions)
        parts.extend(self.private)
        return "-".join(parts)


#: RFC 5646 grandfathered tags -> preferred value (None = no replacement,
#: the tag stays valid as-is). Mirrors langcodes' standardize_tag behaviour.
_GRANDFATHERED: dict[str, Optional[str]] = {
    "en-gb-oed": "en-gb-oxendict",
    "i-ami": "ami", "i-bnn": "bnn", "i-default": None, "i-enochian": None,
    "i-hak": "hak", "i-klingon": "tlh", "i-lux": "lb", "i-mingo": None,
    "i-navajo": "nv", "i-pwn": "pwn", "i-tao": "tao", "i-tay": "tay",
    "i-tsu": "tsu", "sgn-be-fr": "sfb", "sgn-be-nl": "vgt", "sgn-ch-de": "sgg",
    "art-lojban": "jbo", "cel-gaulish": None, "no-bok": "nb", "no-nyn": "nn",
    "zh-guoyu": "cmn", "zh-hakka": "hak", "zh-min": None, "zh-min-nan": "nan",
    "zh-xiang": "hsn",
}

#: Extended-language subtags -> their single registered prefix
#: (RFC 5646 §2.2.2 / IANA registry: "zh-cmn-Hans" canonicalizes to
#: "cmn-Hans", and "cmn" is only valid after "zh"). Subset: the Chinese,
#: Arabic, Malay, and sign-language families a crawl actually encounters.
_EXTLANG_PREFIX = {
    **{e: "zh" for e in "cmn yue nan hak hsn gan wuu cdo cjy czh czo lzh mnp".split()},
    **{e: "ar" for e in "arb abv acm acq aeb afb ajp apc apd arq ars ary arz auz ayl ayn ayp".split()},
    **{e: "ms" for e in "zsm bjn".split()},
    **{e: "sgn" for e in "ase bfi csl fsl gsg".split()},
}


def parse_tag(tag: str) -> Optional[ParsedTag]:
    """Parse ``tag``; return None if syntactically/registrationally invalid."""
    if not tag:
        return None
    lowered = tag.lower()
    if lowered in _GRANDFATHERED:
        replacement = _GRANDFATHERED[lowered]
        if replacement is None:
            # Valid grandfathered tag with no preferred value: represent as
            # an opaque single-language parse so it round-trips unchanged.
            return ParsedTag(lowered, None, None, [], [], [])
        lowered = replacement
    subtags = lowered.split("-")
    # Extlang: language + 3-letter extended subtag; the extlang replaces the
    # prefix (zh-cmn-Hans -> cmn-Hans) — but only under its one registered
    # prefix ("xx-yue" must stay invalid, not launder into "yue").
    if len(subtags) >= 2 and _EXTLANG_PREFIX.get(subtags[1]) == subtags[0]:
        subtags = subtags[1:]
    lang = subtags[0]
    if not _ALPHA.match(lang):
        return None
    if len(lang) == 2:
        # Deprecated codes (iw/in/ji/jw/mo/sh) are registered tags: langcodes'
        # tag_is_valid accepts them, and normalize_tag later replaces them.
        if lang not in _ISO639_1 and lang not in _DEPRECATED:
            return None
    elif len(lang) == 3:
        if not (
            lang in _ISO639_3_ALL
            or lang in _ISO639_3_TO_1
            or _PRIVATE_LANG.match(lang)
        ):
            return None
    else:
        return None

    script: Optional[str] = None
    region: Optional[str] = None
    variants: list[str] = []
    extensions: list[str] = []
    private: list[str] = []
    i = 1
    n = len(subtags)

    if i < n and len(subtags[i]) == 4 and _ALPHA.match(subtags[i]):
        if subtags[i] not in _SCRIPTS:
            return None
        script = subtags[i]
        i += 1
    if i < n and (
        (len(subtags[i]) == 2 and _ALPHA.match(subtags[i]))
        or (len(subtags[i]) == 3 and _DIGITS.match(subtags[i]))
    ):
        region = subtags[i]
        i += 1
    while i < n and (
        (5 <= len(subtags[i]) <= 8 and _ALNUM.match(subtags[i]))
        or (len(subtags[i]) == 4 and subtags[i][0].isdigit() and _ALNUM.match(subtags[i]))
    ):
        variants.append(subtags[i])
        i += 1
    # Extensions: singleton (not 'x') followed by 2-8 char subtags.
    while i < n and len(subtags[i]) == 1 and subtags[i] != "x":
        ext = [subtags[i]]
        i += 1
        if i >= n or not (2 <= len(subtags[i]) <= 8 and _ALNUM.match(subtags[i])):
            return None
        while i < n and 2 <= len(subtags[i]) <= 8 and _ALNUM.match(subtags[i]) and len(subtags[i]) != 1:
            ext.append(subtags[i])
            i += 1
        extensions.append("-".join(ext))
    # Private use.
    if i < n and subtags[i] == "x":
        rest = subtags[i:]
        if any(not (1 <= len(s) <= 8 and _ALNUM.match(s)) for s in rest[1:]) or len(rest) == 1:
            return None
        private.append("-".join(rest))
        i = n
    if i != n:
        return None
    return ParsedTag(lang, script, region, variants, extensions, private)


def tag_is_valid(tag: str) -> bool:
    """True if the tag parses and all subtags pass registry checks."""
    return parse_tag(tag) is not None


def normalize_tag(
    tag: str,
    prefer_macrolanguage: bool = False,
    simplify_script: bool = False,
) -> Optional[str]:
    """Normalize a tag: 3->2 letter language, deprecated replacement, casing.

    Returns None if the tag is invalid.
    """
    parsed = parse_tag(tag)
    if parsed is None:
        return None
    lang = parsed.language
    lang = _ISO639_3_TO_1.get(lang, lang)
    if prefer_macrolanguage:
        lang = _MACROLANGUAGE.get(lang, lang)
        lang = _ISO639_3_TO_1.get(lang, lang)
    replacement = _DEPRECATED.get(lang)
    if replacement and "-" in replacement:
        rep_lang, rep_script = replacement.split("-", 1)
        lang = rep_lang
        if parsed.script is None:
            parsed.script = rep_script.lower()
    elif replacement:
        lang = replacement
    parsed.language = lang
    if simplify_script and parsed.script is not None:
        if _DEFAULT_SCRIPT.get(lang) == parsed.script:
            parsed.script = None
    return parsed.to_tag()


#: Path segments never treated as locales (reference ``util/locale.py:8`` —
#: "tag" pages would otherwise parse as the Tagoi language).
_EXCLUDED_SEGMENTS = frozenset({"tag"})


def extract_locale(link: str) -> Optional[str]:
    """Locale from the first URL path segment, standardized; else None.

    Mirrors ``util/locale.py:11-45``: the segment must be a valid BCP-47 tag,
    not excluded, and carry no extension subtags (extension-bearing parses of
    slugs like ``don-t-let-...`` are rejected as mis-parses).
    """
    try:
        path = urlparse(link).path
    except ValueError:
        # urlparse raises on malformed bracket hosts ("http://[") — a crawl
        # corpus will contain them; no url, no locale.
        return None
    first = remove_ends(path, "/").split("/")[0]
    parsed = parse_tag(first)
    if parsed is None or first.lower() in _EXCLUDED_SEGMENTS:
        return None
    if parsed.extensions:
        return None
    return normalize_tag(first, prefer_macrolanguage=True, simplify_script=True)

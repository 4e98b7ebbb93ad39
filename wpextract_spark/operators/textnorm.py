"""Unicode canonicalization for web text + CCNet-style dedup keys.

Every serious web-corpus pipeline (C4, CCNet, Gopher, Dolma) canonicalizes
text before filtering and deduplication: crawled HTML arrives with mixed
Unicode normal forms (composed vs combining accents), typographic
punctuation (curly quotes, em dashes, ellipsis glyphs), non-breaking /
zero-width spaces, and stray control bytes — all of which break exact-hash
dedup and skew token statistics while being semantically identical.

Two surfaces:

* :func:`normalize_text_udf` — display-preserving canonical form: NFC,
  typographic-punctuation fold, zero-width strip, C0-control strip
  (tab/newline family kept), horizontal-whitespace collapse, trim.
* :func:`dedup_key_udf` — the aggressive CCNet-style matching key: NFD,
  Latin diacritic strip (U+0300–U+036F — the ``strip_accents`` coverage,
  which keeps the DuckDB oracle bit-identical), lowercase, digits→0,
  drop everything outside ``[a-z0]``+whitespace, collapse, trim.  Keys are
  for GROUPING (exact/fuzzy dedup, URL-text identity), never for output.

Both are Arrow-batched ``pandas_udf`` stages built from vectorized
``Series.str`` kernels — there is no JVM Unicode-normalization expression,
so this is exactly the "Python only where Spark genuinely can't" seam; the
downstream grouping/joining stays JVM-side.  At 100 TB the UDF is a
map-side, shuffle-free pass whose cost is one Arrow round-trip over the
text column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Single-char folds applied AFTER NFC: typographic punctuation to its ASCII
# intent, NBSP to space, zero-width characters deleted.  str.translate maps
# a char to a string, so the ellipsis expands and zero-widths vanish in the
# same pass; the DuckDB oracle mirrors this with translate()+replace().
_FOLDS = str.maketrans(
    {
        " ": " ",  # no-break space
        "‘": "'",  # left single quote
        "’": "'",  # right single quote
        "“": '"',  # left double quote
        "”": '"',  # right double quote
        "–": "-",  # en dash
        "—": "-",  # em dash
        "…": "...",  # horizontal ellipsis
        "​": "",  # zero width space
        "‌": "",  # zero width non-joiner
        "‍": "",  # zero width joiner
        "﻿": "",  # BOM / zero width no-break
    }
)

# C0 controls minus the whitespace family (\t\n\v\f\r survive to the
# whitespace collapse), plus DEL.  ASCII-explicit so Python re and RE2
# agree byte-for-byte.
_CONTROLS = r"[\x00-\x08\x0e-\x1f\x7f]"
# Horizontal whitespace: collapse runs to one space but PRESERVE newlines —
# line structure feeds line-dedup and paragraph chunking downstream.
_HSPACE = r"[ \t\r\f\v]+"
# Diacritic strip for dedup keys: the combining-diacritical block only.
_MARKS = "[̀-ͯ]"
_KEY_DROP = r"[^a-z0 \t\n\r\f\v]"
_ANY_WS = r"[ \t\n\r\f\v]+"


def _normalize(text: pd.Series) -> pd.Series:
    return (
        text.str.normalize("NFC")
        .str.translate(_FOLDS)
        .str.replace(_CONTROLS, "", regex=True)
        .str.replace(_HSPACE, " ", regex=True)
        .str.strip()
    )


def _dedup_key(text: pd.Series) -> pd.Series:
    return (
        text.str.normalize("NFD")
        .str.replace(_MARKS, "", regex=True)
        .str.lower()
        .str.replace("[0-9]", "0", regex=True)
        .str.replace(_KEY_DROP, "", regex=True)
        .str.replace(_ANY_WS, " ", regex=True)
        .str.strip()
    )


def normalize_text_udf():
    """(text) -> canonical display text; null in, null out."""

    @F.pandas_udf(StringType())
    def _norm(text: pd.Series) -> pd.Series:
        return _normalize(text)

    return _norm


def dedup_key_udf():
    """(text) -> aggressive matching key for dedup grouping; null-safe."""

    @F.pandas_udf(StringType())
    def _key(text: pd.Series) -> pd.Series:
        return _dedup_key(text)

    return _key

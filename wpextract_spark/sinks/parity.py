"""Byte-parity JSON sink (reference ``extractors/io.py:90-182``).

Writes one JSON array per entity with the reference's exact formatting:
``indent=2``, ASCII escaping, NaN -> null, ``id`` first, dot-notation columns
re-nested into dicts, timestamps ISO-8601, external links WITHOUT a
``destination`` key (absent, not null — dataclass asdict semantics).

This sink exists for the pytest parity gate and small exports; the scale path
writes the same struct schema straight to parquet/Iceberg
(``DataFrame.write``) and is exercised by bench.py.
"""

from __future__ import annotations

import json
import math
from datetime import date, datetime
from pathlib import Path
from typing import Any, Optional

from pyspark.sql import DataFrame, Row

from wpextract_spark.sources.entities import ORD, safe


def _set_nested(record: dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    current = record
    for key in parts[:-1]:
        current = current.setdefault(key, {})
    current[parts[-1]] = value


def _plain(value: Any) -> Any:
    """Spark value -> JSON-safe plain Python."""
    if value is None:
        return None
    if isinstance(value, Row):
        return {k: _plain(v) for k, v in value.asDict().items()}
    if isinstance(value, (list, tuple)):
        return [_plain(v) for v in value]
    if isinstance(value, (datetime, date)):
        return value.isoformat()
    if isinstance(value, float) and math.isnan(value):
        return None
    return value


def _span_internal_link(row: Optional[Row]) -> Optional[dict]:
    if row is None:
        return None
    return {"text": row["text"], "href": row["href"], "destination": _plain(row["destination"])}


def _span_external_link(row: Optional[Row]) -> Optional[dict]:
    if row is None:
        return None
    # External links are plain Link dataclasses: no destination key at all.
    return {"text": row["text"], "href": row["href"]}


def _span_image(row: Optional[Row]) -> Optional[dict]:
    if row is None:
        return None
    out = {"src": row["src"], "alt": row["alt"], "caption": row["caption"]}
    if row["internal"]:
        # Only ResolvableMediaUse carries the destination slot.
        out["destination"] = _plain(row["destination"])
    return out


def _span_translation(row: Optional[Row]) -> Optional[dict]:
    if row is None:
        return None
    return {
        "text": row["text"],
        "href": row["href"],
        "destination": _plain(row["destination"]),
        "lang": row["lang"],
    }


#: Span columns that need key-dropping conversion rules.
_SPAN_CONVERTERS = {
    "links.internal": lambda arr: None if arr is None else [_span_internal_link(x) for x in arr],
    "links.external": lambda arr: None if arr is None else [_span_external_link(x) for x in arr],
    "images": lambda arr: None if arr is None else [_span_image(x) for x in arr],
    "translations": lambda arr: None if arr is None else [_span_translation(x) for x in arr],
}


def export_entity_json(
    df: Optional[DataFrame],
    export_columns: list[str],
    rename: dict[str, str],
    path: Path,
) -> int:
    """Write the entity as a reference-format JSON array; returns row count.

    Args:
        df: the final entity frame (safe-named columns + ``_ord``), or None
            for an absent entity (writes ``[]``, reference ``io.py:177-178``).
        export_columns: dotted column names, in output order (pre-rename).
        rename: dotted-name renames applied at export (RENAME_COLUMNS).
        path: destination file.
    """
    if df is None:
        path.write_text("[]")
        return 0

    records = []
    ordered = df.orderBy(ORD)
    for row in ordered.toLocalIterator():
        record: dict[str, Any] = {"id": _plain(row["id"])}
        for dotted in export_columns:
            value = row[safe(dotted)]
            converter = _SPAN_CONVERTERS.get(dotted)
            value = converter(value) if converter else _plain(value)
            out_name = rename.get(dotted, dotted)
            _set_nested(record, out_name, value)
        records.append(record)

    with open(path, "w") as handle:
        json.dump(records, handle, indent=2, allow_nan=False)
    return len(records)

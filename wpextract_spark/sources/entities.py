"""WP-API entity sources: JSON dumps -> typed Spark DataFrames.

The reference loads each entity dump with ``pd.json_normalize`` and later
projects to a fixed export schema via ``df.columns.intersection(EXPORT_COLUMNS)``
(``extractors/io.py:30-53``; projections at e.g. ``posts.py:132``). Presence of
an export key in the output therefore depends on presence in the *input* — we
reproduce that exactly by deriving the column set driver-side from the same
flattening, then shipping only the needed columns to Spark with declared types.

Entity dumps are site *metadata* (small by construction — thousands of rows per
site, not billions); the heavyweight work (HTML parsing, text extraction,
locale) happens in distributed Arrow-batched stages afterwards. At Common-Crawl
scale, entities arrive as Iceberg tables directly and skip this loader.

Column names are "safe-named" for Spark (``.`` -> ``__``); the dotted names are
restored at export by the parity sink.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

#: Ingest-order column carried through the whole pipeline: Spark gives no free
#: row order (SURVEY.md §2.5 A5), the reference preserves input order.
ORD = "_ord"


def safe(name: str) -> str:
    return name.replace(".", "__")


def unsafe(name: str) -> str:
    return name.replace("__", ".")


# Reference export schemas (EXPORT_COLUMNS / RENAME_COLUMNS per entity module).
POSTS_EXPORT = [
    "author", "categories", "comment_status", "content.rendered", "content.text",
    "date_gmt", "embeds", "excerpt.rendered", "excerpt.text", "featured_media",
    "images", "language", "link", "link_locale", "links.external", "links.internal",
    "modified_gmt", "og_image_url", "slug", "status", "sticky", "tags",
    "title.rendered", "title.text", "translations", "yoast_head_json.title",
]
POSTS_RENAME = {
    "title.rendered": "title.html",
    "content.rendered": "content.html",
    "excerpt.rendered": "excerpt.html",
    "yoast_head_json.title": "page_title",
}

PAGES_EXPORT = [
    "author", "content.rendered", "content.text", "date_gmt", "embeds",
    "excerpt.rendered", "excerpt.text", "featured_media", "images", "link",
    "link_locale", "links.external", "links.internal", "modified_gmt", "parent",
    "slug", "template", "title.rendered", "yoast_head_json.title",
]
PAGES_RENAME = {
    "content.rendered": "content.html",
    "title.rendered": "title.html",
    "excerpt.rendered": "excerpt.html",
    "yoast_head_json.title": "page_title",
}

MEDIA_EXPORT = [
    "alt_text", "author", "caption.rendered", "caption.text", "date_gmt",
    "description.rendered", "description.text", "guid.rendered",
    "media_details.bitrate", "media_details.file",
    "media_details.image_meta.camera", "media_details.image_meta.created_timestamp",
    "media_details.image_meta.credit", "media_details.image_meta.focal_length",
    "media_details.image_meta.iso", "media_details.image_meta.orientation",
    "media_details.length", "media_details.mime_type", "media_details.original_image",
    "media_details.parent_image.attachment_id", "media_type", "mime_type",
    "modified_gmt", "post", "slug", "source_url", "title.rendered", "title.text",
    "yoast_head_json.og_url", "yoast_head_json.title",
]
MEDIA_RENAME = {
    "caption.rendered": "caption.html",
    "description.rendered": "description.html",
    "guid.rendered": "guid",
    "post": "post_id",
    "title.rendered": "title.html",
    "yoast_head_json.title": "page_title",
    "media_details.parent_image.attachment_id": "parent_image_id",
    "yoast_head_json.og_url": "og_url",
}

TAGS_EXPORT = ["count", "description", "link", "link_locale", "name", "slug"]
CATEGORIES_EXPORT = ["name", "slug", "description", "count", "link", "link_locale", "parent"]
USERS_EXPORT = ["avatar", "description", "link", "name", "slug", "url"]

#: Columns with known types regardless of observed data.
_TYPE_HINTS: dict[str, Any] = {
    "id": LongType(),
    "author": LongType(),
    "featured_media": LongType(),
    "parent": LongType(),
    "count": LongType(),
    "post": LongType(),
    "menu_order": LongType(),
    "media_details.parent_image.attachment_id": LongType(),
    "media_details.width": LongType(),
    "media_details.height": LongType(),
    "sticky": BooleanType(),
    "categories": ArrayType(LongType()),
    "tags": ArrayType(LongType()),
    "date_gmt": TimestampNTZType(),
    "modified_gmt": TimestampNTZType(),
}


def _infer_type(series: pd.Series, dotted: str):
    if dotted in _TYPE_HINTS:
        return _TYPE_HINTS[dotted]
    sample = next((v for v in series if v is not None and not _is_nan(v)), None)
    if isinstance(sample, bool):
        return BooleanType()
    if isinstance(sample, int):
        return LongType()
    if isinstance(sample, float):
        return DoubleType()
    return StringType()


def _is_nan(value: Any) -> bool:
    return isinstance(value, float) and math.isnan(value)


def _clean(value: Any, dtype) -> Any:
    if value is None or _is_nan(value) or value is pd.NA:
        return None
    if isinstance(dtype, TimestampNTZType):
        return pd.Timestamp(value).to_pydatetime()
    if isinstance(dtype, LongType):
        return int(value)
    if isinstance(dtype, DoubleType):
        return float(value)
    if isinstance(dtype, ArrayType):
        return [int(v) for v in value]
    if isinstance(dtype, BooleanType):
        return bool(value)
    return value


@dataclass
class EntityFrame:
    """A loaded entity: the Spark frame plus export bookkeeping."""

    name: str
    df: Optional[DataFrame]
    #: dotted input columns present (json_normalize order)
    present: list[str] = field(default_factory=list)
    #: dotted export column order (filled by the pipeline once derived
    #: columns are known)
    export_columns: list[str] = field(default_factory=list)
    rename: dict[str, str] = field(default_factory=dict)

    def has(self, dotted: str) -> bool:
        return dotted in self.present


def og_image_url(raw_value: Any, strict_nan_check: bool) -> Optional[str]:
    """First og_image URL, reference semantics (``posts.py:89-96``,
    ``users.py:25-30``). ``strict_nan_check`` mirrors the posts variant which
    also guards against a NaN cell."""
    if strict_nan_check and (raw_value is None or _is_nan(raw_value)):
        return None
    if raw_value is None or _is_nan(raw_value) or len(raw_value) == 0:
        return None
    return raw_value[0]["url"]


#: Dumps at or above this size skip the driver-side json.load + row loop and
#: parse on the EXECUTORS via spark.read.json. Entity dumps are site
#: metadata (thousands of rows), so the driver path is the common case; the
#: threshold is a guard against someone pointing the loader at a multi-GB
#: dump and silently running it on one core.
SPARK_READ_THRESHOLD = 64 << 20


def _schema_leaves(schema, prefix: str = "") -> list[tuple[str, Any]]:
    """``(dotted leaf name, dataType)`` pairs of a Spark schema, descending
    STRUCTS only — mirrors pd.json_normalize, which flattens nested dicts
    but leaves arrays (incl. arrays of objects) as single object-valued
    columns. Types are collected during the walk because leaf names are not
    re-splittable: JSON keys may contain literal dots (Yoast emits
    ``twitter_misc.Est. reading time``)."""
    out: list[tuple[str, Any]] = []
    for f in schema.fields:
        dotted = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(_schema_leaves(f.dataType, dotted + "."))
        else:
            out.append((dotted, f.dataType))
    return out


def _first_record_columns(path: Path) -> list[str]:
    """Dotted column order of the FIRST record (bounded head read +
    json_normalize), so the Spark path reproduces json_normalize's
    first-seen column order instead of Spark's alphabetical inference.
    Columns that only appear in later records are appended afterwards in
    inferred-schema order — the reference's pandas loader would interleave
    them at first encounter; for WP dumps (uniform key sets) the two agree
    exactly."""
    with open(path, "rb") as handle:
        head = handle.read(8 << 20).decode("utf-8", errors="ignore")
    stripped = head.lstrip()
    if not stripped.startswith("["):
        return []
    idx = 1
    while idx < len(stripped) and stripped[idx].isspace():
        idx += 1
    try:
        first, _ = json.JSONDecoder().raw_decode(stripped, idx)
        return [str(c) for c in pd.json_normalize([first]).columns]
    except ValueError:
        return []


def _load_entity_spark(
    spark: SparkSession,
    name: str,
    path: Path,
    needed: list[str],
    derive_expr: Optional[dict[str, Any]] = None,
) -> EntityFrame:
    """Executor-side loader for oversized dumps: spark.read.json parses the
    records distributed (schema inference doubles as the union presence
    set); needed dotted columns become struct-path projections cast to the
    same types the driver path infers. Row order: a single multiLine JSON
    file parses as one input split, so ``monotonically_increasing_id`` is
    the file order — at true crawl scale entities arrive as tables with an
    explicit order column and skip this loader entirely (module
    docstring)."""
    raw_df = spark.read.option("multiLine", "true").json(str(path))
    if not raw_df.columns or raw_df.isEmpty():
        return EntityFrame(name=name, df=None)

    leaves = _schema_leaves(raw_df.schema)
    leaf_types = dict(leaves)
    inferred = [name for name, _ in leaves]
    head_order = _first_record_columns(path)
    present = [c for c in head_order if c in leaf_types] + [
        c for c in inferred if c not in head_order
    ]

    cols = [c for c in needed if c in present]
    if "id" not in cols:
        cols = ["id", *cols]

    import pyspark.sql.functions as F

    exprs = []
    for dotted in cols:
        col = F.col(dotted)
        hint = _TYPE_HINTS.get(dotted)
        if hint is not None:
            col = col.cast(hint)
        elif not isinstance(
            leaf_types[dotted], (LongType, DoubleType, BooleanType, StringType)
        ):
            col = col.cast(StringType())  # driver path's sample fallback
        exprs.append(col.alias(safe(dotted)))
    for col_name, fn in (derive_expr or {}).items():
        exprs.append(fn(raw_df, present).cast(StringType()).alias(safe(col_name)))
    exprs.append(F.monotonically_increasing_id().alias(ORD))
    return EntityFrame(name=name, df=raw_df.select(exprs), present=present)


def load_entity(
    spark: SparkSession,
    name: str,
    path: Path,
    needed: list[str],
    derive: Optional[dict[str, Any]] = None,
    derive_expr: Optional[dict[str, Any]] = None,
    spark_read_threshold: int = SPARK_READ_THRESHOLD,
) -> EntityFrame:
    """Load one entity dump into a typed Spark DataFrame.

    Args:
        spark: the session.
        name: entity name (posts/pages/media/tags/categories/users).
        path: JSON file path (array of WP API records).
        needed: dotted columns to ship to Spark (subset of what exists is
            taken; missing ones are simply absent, like the reference).
        derive: extra string-typed columns computed driver-side from the
            flattened frame, ``{column_name: fn(flat_df) -> pd.Series}`` —
            used for O(1)-per-row scalar plucks whose presence-gating depends
            on the input column set (og_image_url, avatar).
        derive_expr: the same derived columns as Spark Column factories,
            ``{column_name: fn(raw_df, present) -> Column}`` — used by the
            executor-side path for oversized dumps.
        spark_read_threshold: dumps at/above this many bytes parse on the
            executors via :func:`_load_entity_spark` instead of the
            driver-side row loop.

    Returns:
        EntityFrame with ``df=None`` if the file is missing or empty
        (reference ``io.py:44-52``).
    """
    if not path.is_file():
        return EntityFrame(name=name, df=None)
    if path.stat().st_size >= spark_read_threshold:
        return _load_entity_spark(spark, name, path, needed, derive_expr)
    with open(path) as handle:
        raw = json.load(handle)
    if len(raw) == 0:
        return EntityFrame(name=name, df=None)

    flat = pd.json_normalize(raw)
    present = [str(c) for c in flat.columns]

    cols = [c for c in needed if c in flat.columns]
    if "id" not in cols:
        cols = ["id", *cols]

    fields = []
    dtypes = {}
    for dotted in cols:
        dtype = _infer_type(flat[dotted], dotted)
        dtypes[dotted] = dtype
        fields.append(StructField(safe(dotted), dtype, True))
    derived_series = {}
    for col_name, fn in (derive or {}).items():
        derived_series[col_name] = fn(flat)
        fields.append(StructField(safe(col_name), StringType(), True))
    fields.append(StructField(ORD, LongType(), False))
    schema = StructType(fields)

    rows = []
    for i in range(len(flat)):
        row = [_clean(flat[dotted].iloc[i], dtypes[dotted]) for dotted in cols]
        for col_name in derived_series:
            value = derived_series[col_name].iloc[i]
            row.append(None if value is None or _is_nan(value) else str(value))
        row.append(i)
        rows.append(tuple(row))

    df = spark.createDataFrame(rows, schema)
    return EntityFrame(name=name, df=df, present=present)

"""Structured-data extraction: schema.org JSON-LD blocks.

Virtually every WordPress page carries machine-readable metadata in
``<script type="application/ld+json">`` blocks (Yoast/RankMath emit them
site-wide), and large-scale pipelines mine them for clean titles, publish
dates and authorship — fields far more reliable than visual heuristics.
This kernel pulls the blocks out of the parsed DOM and summarizes the
fields a dataset builder keys on.

Robustness rules (web JSON-LD is messy):

* a block may be a single object, a top-level array, or a Yoast-style
  ``{"@context": ..., "@graph": [...]}`` envelope — all flattened;
* unparseable JSON in one block never poisons the others (skipped);
* ``@type`` may be a string or a list; ``author`` may be an object, a list
  of objects, or a bare string — all normalized.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from wpextract_spark.htmlkit.dom import Tag


def extract_jsonld(root: Tag) -> list[dict]:
    """All JSON-LD objects on the page, @graph/array envelopes flattened,
    in document order; malformed blocks skipped."""
    objects: list[dict] = []
    for tag in root.find_all("script"):
        if (tag.get("type") or "").strip().lower() != "application/ld+json":
            continue
        try:
            data = json.loads(tag.get_text())
        except ValueError:
            continue
        items = data if isinstance(data, list) else [data]
        for item in items:
            if not isinstance(item, dict):
                continue
            graph = item.get("@graph")
            if isinstance(graph, list):
                objects.extend(g for g in graph if isinstance(g, dict))
            else:
                objects.append(item)
    return objects


def _types(obj: dict) -> list[str]:
    value = obj.get("@type")
    if isinstance(value, str):
        return [value]
    if isinstance(value, list):
        return [v for v in value if isinstance(v, str)]
    return []


def _author_name(value: Any) -> Optional[str]:
    if isinstance(value, str):
        return value or None
    if isinstance(value, dict):
        name = value.get("name")
        return name if isinstance(name, str) and name else None
    if isinstance(value, list):
        for item in value:
            name = _author_name(item)
            if name:
                return name
    return None


def jsonld_summary(objects: list[dict]) -> dict:
    """The dataset-builder fields: distinct @type values (document order)
    plus the first headline / datePublished / author seen."""
    types: list[str] = []
    headline = date_published = author = None
    for obj in objects:
        for t in _types(obj):
            if t not in types:
                types.append(t)
        if headline is None and isinstance(obj.get("headline"), str):
            headline = obj["headline"]
        if date_published is None and isinstance(obj.get("datePublished"), str):
            date_published = obj["datePublished"]
        if author is None:
            author = _author_name(obj.get("author"))
    return {
        "types": types,
        "headline": headline,
        "date_published": date_published,
        "author": author,
    }


def extract_publish_signals(root: Tag) -> dict:
    """The page's publish-date signals, ONE parse, in precedence order.

    Returns raw strings (normalization/validation happens JVM-side in the
    cascade — ``try_to_date`` there, not here, so a garbage value in a
    stronger signal falls through to the next):

    * ``jsonld_date`` — first ``datePublished`` across JSON-LD objects;
    * ``meta_time`` — ``<meta property="article:published_time">`` (the
      Open Graph article namespace WordPress themes emit);
    * ``time_attr`` — the first ``<time datetime=...>`` element.
    """
    jsonld_date = jsonld_summary(extract_jsonld(root))["date_published"]
    meta_time = None
    for tag in root.find_all("meta"):
        if (
            (tag.get("property") or "").strip().lower()
            == "article:published_time"
            and tag.get("content")
        ):
            meta_time = tag["content"].strip()
            break
    time_attr = None
    for tag in root.find_all("time"):
        if tag.get("datetime"):
            time_attr = tag["datetime"].strip()
            break
    return {
        "jsonld_date": jsonld_date,
        "meta_time": meta_time,
        "time_attr": time_attr,
    }

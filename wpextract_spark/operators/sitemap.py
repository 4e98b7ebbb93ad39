"""Sitemap ingestion: fetched sitemap XML payloads -> frontier rows.

Pairs with :func:`wpextract_spark.operators.robots.robots_directives_udf`
(which surfaces where the sitemaps LIVE): this stage turns the fetched XML
into crawl-frontier entries.  Map-side Arrow UDF over the sitemaps table
(one row per fetched sitemap — tiny next to pages); callers explode
``entries`` and union index children back into the fetch queue.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from wpextract_spark.kernel.sitemap import parse_sitemap

SITEMAP_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField(
            "entries",
            ArrayType(
                StructType(
                    [
                        StructField("loc", StringType()),
                        StructField("lastmod", StringType()),
                        StructField("changefreq", StringType()),
                        StructField("priority", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def sitemap_udf():
    """(xml) -> struct<kind, entries>; null/unparseable -> (null, [])."""

    def _one(xml):
        if xml is None:
            return (None, [])
        try:
            parsed = parse_sitemap(xml)
        except Exception:
            return (None, [])
        return (parsed["kind"], parsed["entries"])

    @F.pandas_udf(SITEMAP_TYPE)
    def _sitemap(xml: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(value) for value in xml], columns=["kind", "entries"]
        )

    return _sitemap


FEED_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("title", StringType()),
        StructField(
            "entries",
            ArrayType(
                StructType(
                    [
                        StructField("title", StringType()),
                        StructField("link", StringType()),
                        StructField("published", StringType()),
                        StructField("guid", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def feed_udf():
    """(xml) -> struct<kind, title, entries> for RSS 2.0 / Atom payloads.

    The feed-polling leg of the scheduler: fresher than recrawling listing
    pages, and the entry links/pubDates flow straight into the frontier
    and the publish-date cascade. Null/unparseable -> (null, null, [])."""
    from wpextract_spark.kernel.feed import parse_feed

    def _one(xml):
        if xml is None:
            return (None, None, [])
        try:
            parsed = parse_feed(xml)
        except Exception:
            return (None, None, [])
        return (parsed["kind"], parsed["title"], parsed["entries"])

    @F.pandas_udf(FEED_TYPE)
    def _feed(xml: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(value) for value in xml], columns=["kind", "title", "entries"]
        )

    return _feed

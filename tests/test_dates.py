"""Publish-date cascade: signal precedence, fall-through, URL pattern."""

import datetime

import pytest

from wpextract_spark.operators.dates import publish_dates


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "html", "url"])
    return {r.doc_id: r for r in publish_dates(df).collect()}


LD = '<script type="application/ld+json">%s</script>'


def test_precedence_and_fallthrough(spark):
    got = _run(
        spark,
        [
            (
                1,  # jsonld beats meta
                (LD % '{"datePublished":"2024-01-02T10:00:00Z"}')
                + '<meta property="article:published_time" content="2023-12-31">',
                "https://e/p",
            ),
            (
                2,  # garbage jsonld falls through to meta
                (LD % '{"datePublished":"coming soon"}')
                + '<meta property="article:published_time" content="2023-12-31T23:59:59Z">',
                "https://e/p",
            ),
            (3, '<time datetime="2022-05-05">x</time>', "https://e/p"),
            (4, "<p>none</p>", "https://e/2021/07/15/post"),
            (5, "<p>none</p>", "https://e/post"),
            (6, None, "https://e/2020/01/09/x"),
        ],
    )
    assert (got[1].publish_date, got[1].date_source) == (
        datetime.date(2024, 1, 2),
        "jsonld",
    )
    assert (got[2].publish_date, got[2].date_source) == (
        datetime.date(2023, 12, 31),
        "meta",
    )
    assert (got[3].publish_date, got[3].date_source) == (
        datetime.date(2022, 5, 5),
        "time",
    )
    assert (got[4].publish_date, got[4].date_source) == (
        datetime.date(2021, 7, 15),
        "url",
    )
    assert (got[5].publish_date, got[5].date_source) == (None, None)
    assert (got[6].publish_date, got[6].date_source) == (
        datetime.date(2020, 1, 9),
        "url",
    )


def test_url_pattern_requires_valid_calendar_date(spark):
    # /2021/13/45/ matches the regex shape but try_to_date rejects it.
    got = _run(spark, [(1, "<p>x</p>", "https://e/2021/13/45/post")])
    assert got[1].publish_date is None
    # century guard: /1850/01/01/ is not a crawl-era date.
    got = _run(spark, [(1, "<p>x</p>", "https://e/1850/01/01/post")])
    assert got[1].publish_date is None

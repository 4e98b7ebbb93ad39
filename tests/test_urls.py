"""URL canonicalization edge cases + canonical-URL dedup."""

from pyspark.sql import functions as F

from wpextract_spark.functions.urls import canonicalize_url
from wpextract_spark.operators.corpusfilters import url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url("url")).collect()]


def test_canonicalize_url_rules(spark):
    cases = {
        # fragment + tracking params + trailing slash + host case
        "https://Example.org/post/7/?id=7&utm_source=feed#top":
            "https://example.org/post/7?id=7",
        # default https port
        "https://example.org:443/post/7?id=7": "https://example.org/post/7?id=7",
        # default http port NOT stripped for https and vice versa
        "http://example.org:443/a": "http://example.org:443/a",
        "http://example.org:80/a": "http://example.org/a",
        # non-default port preserved
        "https://example.org:8443/a": "https://example.org:8443/a",
        # param sorting makes order irrelevant; bare tracking name dropped
        "https://a.example/x?b=2&a=1&ref": "https://a.example/x?a=1&b=2",
        # root slash kept; path case preserved
        "HTTPS://A.Example/": "https://a.example/",
        "https://a.example/CaseSensitive/Path": "https://a.example/CaseSensitive/Path",
        # all params tracking -> no query at all
        "https://a.example/x?utm_campaign=c&gclid=123&fbclid=z":
            "https://a.example/x",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_url_dedup_keeps_min_id(spark):
    rows = [
        (1, "https://Example.org/p/1/?utm_source=a"),
        (2, "https://example.org:443/p/1"),
        (3, "https://example.org/p/2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: (r["canon_url"], r["keep"]) for r in url_dedup(df).collect()}
    assert out[1] == ("https://example.org/p/1", True)
    assert out[2] == ("https://example.org/p/1", False)
    assert out[3] == ("https://example.org/p/2", True)


def _surt(spark, urls):
    from wpextract_spark.functions.urls import surt_key

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(surt_key("url")).collect()]


def test_surt_key_rules(spark):
    cases = {
        # scheme dropped, www stripped, host reversed, rest casefolded,
        # params canonical-sorted, fragment + tracking gone
        "https://WWW.blog.Example.org/Post/7/?b=2&utm_source=x&a=1#top":
            "org,example,blog)/post/7?a=1&b=2",
        # http/https duplicates collapse to the same key
        "http://blog.example.org/Post/7?a=1&b=2":
            "org,example,blog)/post/7?a=1&b=2",
        # default port dropped; non-default kept after the reversed host
        "https://example.org:443/a": "org,example)/a",
        "https://example.org:8080/a": "org,example:8080)/a",
        # www2 mirrors collapse too; root path normalizes to ')/'
        "https://www2.example.org": "org,example)/",
        "https://example.org/": "org,example)/",
    }
    assert _surt(spark, list(cases)) == list(cases.values())


def test_surt_gives_per_site_sort_locality(spark):
    # every URL of a registered domain sorts adjacently — the property
    # that makes SURT the right range-partitioning key for a crawl index
    urls = [
        "https://a.example.org/z",
        "https://other.net/a",
        "https://b.example.org/a",
        "https://www.example.org/m",
    ]
    keys = sorted(_surt(spark, urls))
    example = [k for k in keys if k.startswith("org,example")]
    i = keys.index(example[0])
    assert keys[i : i + len(example)] == example

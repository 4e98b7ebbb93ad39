"""robots.txt kernel (RFC 9309) + Spark operator parity.

Kernel cases follow the published REP examples (RFC 9309 §2.2 / §5 and the
Google robots.txt specification's matching tables — public documents); the
Spark half is differential-tested against the kernel on randomized
rule/path corpora so the JVM expression and the Python matcher can never
drift apart.
"""

import random

import pytest
from pyspark.sql import functions as F

from wpextract_spark.kernel.robots import is_allowed, match_len, parse_robots
from wpextract_spark.operators.robots import (
    _java_regex,
    filter_robots_allowed,
    parse_robots_rules_udf,
    robots_allowed,
)

BASIC = """
# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/pub/
"""


def test_longest_match_wins():
    rules = parse_robots(BASIC)
    assert not is_allowed(rules, "/private/secret.html")
    assert is_allowed(rules, "/private/pub/ok.html")  # allow is longer
    assert is_allowed(rules, "/other")  # no match -> allowed


def test_allow_wins_length_tie():
    rules = parse_robots("User-agent: *\nDisallow: /page\nAllow: /page")
    assert is_allowed(rules, "/page/x")


def test_empty_disallow_matches_nothing():
    rules = parse_robots("User-agent: *\nDisallow:")
    assert rules == []
    assert is_allowed(rules, "/anything")


def test_disallow_all():
    rules = parse_robots("User-agent: *\nDisallow: /")
    assert not is_allowed(rules, "/")
    assert not is_allowed(rules, "/deep/path")


def test_group_selection_exact_beats_star():
    text = (
        "User-agent: FooBot\nDisallow: /foo\n\n"
        "User-agent: *\nDisallow: /star\n"
    )
    assert not is_allowed(parse_robots(text, "foobot"), "/foo/x")
    assert is_allowed(parse_robots(text, "foobot"), "/star/x")  # own group only
    assert not is_allowed(parse_robots(text, "BarBot"), "/star/x")


def test_adjacent_user_agents_share_a_group():
    text = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert not is_allowed(parse_robots(text, "A"), "/x/1")
    assert not is_allowed(parse_robots(text, "b"), "/x/1")
    assert is_allowed(parse_robots(text, "c"), "/x/1")  # no * group


def test_duplicate_agent_groups_are_combined():
    # RFC 9309 §2.2.1: multiple groups naming the same token are combined.
    # Dropping the later group would fail open (default is allow).
    text = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: FooBot\nDisallow: /foo\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    star = parse_robots(text, "*")
    assert not is_allowed(star, "/a/x")
    assert not is_allowed(star, "/b/x")  # later duplicate group still applies
    assert is_allowed(star, "/foo")  # other tokens' groups don't leak in
    # combined across a shared-adjacency run too
    text2 = (
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: a\nDisallow: /y\n"
    )
    assert not is_allowed(parse_robots(text2, "a"), "/y/1")
    assert not is_allowed(parse_robots(text2, "a"), "/x/1")
    assert is_allowed(parse_robots(text2, "b"), "/y/1")  # b got only run 1
    assert not is_allowed(parse_robots(text2, "b"), "/x/1")


def test_duplicate_token_within_one_run_counts_once():
    text = "User-agent: a\nUser-agent: a\nDisallow: /x\n"
    assert parse_robots(text, "a") == [
        r for r in parse_robots(text, "a")
    ]  # no duplicated rules
    assert len(parse_robots(text, "a")) == 1


def test_non_rule_lines_break_agent_adjacency():
    # A Sitemap line between groups must not merge them.
    text = (
        "User-agent: a\nDisallow: /a\n"
        "Sitemap: https://example.org/s.xml\n"
        "User-agent: b\nDisallow: /b\n"
    )
    assert not is_allowed(parse_robots(text, "a"), "/a/x")
    assert is_allowed(parse_robots(text, "a"), "/b/x")
    assert not is_allowed(parse_robots(text, "b"), "/b/x")


def test_wildcard_and_anchor():
    rules = parse_robots("User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*")
    assert not is_allowed(rules, "/docs/report.pdf")
    assert is_allowed(rules, "/docs/report.pdf?x=1")  # $ anchors the end
    assert not is_allowed(rules, "/tmpfile")
    assert not is_allowed(rules, "/tmp/a/b")
    assert is_allowed(rules, "/docs/report.html")


def test_match_len_counts_pattern_octets():
    # RFC longest-match compares pattern length, wildcards included.
    assert match_len("/p", "/page") == 2
    assert match_len("/*.htm", "/page.htm") == 6
    assert match_len("/*.htm$", "/page.htm") == 7
    assert match_len("/*.htm$", "/page.html") is None
    assert match_len("/x", "/page") is None


def test_dollar_only_special_at_end():
    # Mid-pattern '$' is literal per the RFC.
    rules = parse_robots("User-agent: *\nDisallow: /a$b")
    assert not is_allowed(rules, "/a$b/c")
    assert is_allowed(rules, "/ab/c")


def test_java_regex_translation():
    assert _java_regex("/*.pdf$") == "^/.*\\.pdf$"
    assert _java_regex("/a+b") == "^/a\\+b"
    assert _java_regex("/x*y") == "^/x.*y"


# --- Spark operator -------------------------------------------------------


def _random_robots(rng: random.Random) -> str:
    segs = ["/a", "/ab", "/a/b", "/*.pdf$", "/t*p", "/x", "/", "/a$", "/a*"]
    lines = ["User-agent: *"]
    for _ in range(rng.randint(0, 6)):
        verb = rng.choice(["Allow", "Disallow"])
        lines.append(f"{verb}: {rng.choice(segs)}")
    return "\n".join(lines)


def test_spark_matches_kernel_differential(spark):
    rng = random.Random(9309)
    paths = ["/a/b/c.pdf", "/ab", "/a", "/trap", "/x/y", "/", "/a$", "/other"]
    rows = []
    for host_id in range(40):
        text = _random_robots(rng)
        for path in paths:
            rows.append((f"h{host_id}", text, path))
    df = spark.createDataFrame(rows, ["host", "robots_txt", "path"])
    got = (
        df.select(
            "host",
            "path",
            robots_allowed(
                parse_robots_rules_udf()(F.col("robots_txt")), F.col("path")
            ).alias("allowed"),
        )
        .orderBy("host", "path")
        .collect()
    )
    want = {
        (host, path): is_allowed(parse_robots(text), path)
        for host, text, path in rows
    }
    for row in got:
        assert row.allowed == want[(row.host, row.path)], (row.host, row.path)


def test_filter_robots_allowed_fail_open_and_plan(spark):
    pages = spark.createDataFrame(
        [
            ("a.com", "/private/x", 1),
            ("a.com", "/ok", 2),
            ("missing.com", "/anything", 3),
        ],
        ["host", "path", "doc_id"],
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/")],
        ["host", "robots_txt"],
    )
    out = filter_robots_allowed(pages, robots)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # rules side broadcast, no shuffle
    # The per-page verdict must not be a Python stage.
    assert "FlatMapsInPandas" not in plan


def test_null_robots_text_is_fail_open(spark):
    df = spark.createDataFrame([(None,)], "robots_txt string")
    out = df.select(
        robots_allowed(
            parse_robots_rules_udf()(F.col("robots_txt")), F.lit("/x")
        ).alias("allowed")
    ).collect()
    assert out[0].allowed is True


# --- non-rule directives ----------------------------------------------------


def test_sitemaps_are_file_global():
    from wpextract_spark.kernel.robots import robots_directives

    text = (
        "Sitemap: https://e/a.xml\n"
        "User-agent: x\nDisallow: /\nSitemap: https://e/b.xml\n"
        "User-agent: *\nAllow: /\n"
    )
    d = robots_directives(text, "someone")
    assert d["sitemaps"] == ["https://e/a.xml", "https://e/b.xml"]


def test_crawl_delay_group_scoped():
    from wpextract_spark.kernel.robots import robots_directives

    text = (
        "User-agent: FooBot\nCrawl-delay: 9\nDisallow: /f\n\n"
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /s\n"
    )
    assert robots_directives(text, "foobot")["crawl_delay"] == 9.0
    assert robots_directives(text, "other")["crawl_delay"] == 2.5


def test_crawl_delay_malformed_and_absent():
    from wpextract_spark.kernel.robots import robots_directives

    assert robots_directives("User-agent: *\nCrawl-delay: fast")["crawl_delay"] is None
    assert robots_directives("")["crawl_delay"] is None
    assert robots_directives("")["sitemaps"] == []


def test_crawl_delay_shared_by_adjacent_agents():
    from wpextract_spark.kernel.robots import robots_directives

    text = "User-agent: a\nUser-agent: b\nCrawl-delay: 3\nDisallow: /x\n"
    assert robots_directives(text, "a")["crawl_delay"] == 3.0
    assert robots_directives(text, "b")["crawl_delay"] == 3.0
    assert robots_directives(text, "c")["crawl_delay"] is None


def test_percent_encoded_paths_match_verbatim():
    # RFC 9309 compares the percent-encoded octets; no decoding happens.
    rules = parse_robots("User-agent: *\nDisallow: /a%2Fb")
    assert not is_allowed(rules, "/a%2Fb/x")
    assert is_allowed(rules, "/a/b/x")  # decoded form is a DIFFERENT path


def test_filter_robots_shuffle_fallback(spark):
    pages = spark.createDataFrame(
        [("a.com", "/private/x", 1), ("a.com", "/ok", 2)],
        ["host", "path", "doc_id"],
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/")],
        ["host", "robots_txt"],
    )
    out = filter_robots_allowed(pages, robots, broadcast=False)
    assert sorted(r.doc_id for r in out.collect()) == [2]

"""RFC 9309 robots.txt evaluation as a Spark operator.

A retention pipeline over Common-Crawl-style pages re-checks every kept URL
against its host's robots.txt (pages whose host has since disallowed
crawling are dropped).  The expensive, irregular work — parsing the file and
selecting the user-agent group — happens ONCE PER HOST in an Arrow-batched
UDF over the hosts table (orders of magnitude smaller than pages).  The
per-page work — "does any rule match this path, and does the longest one
allow?" — is a pure JVM column expression over the parsed rule array, so the
widest scan in the job never leaves whole-stage codegen.

Scale shape: ``pages ⋈ rules`` is a join on host.  The rules side is one row
per host, so it broadcasts when the host registry fits (the common case) and
otherwise shuffle-joins with AQE skew splitting on mega-hosts; the rule
*array* per host is bounded (robots.txt files are capped at 500 KiB by the
RFC, and the parser keeps only the selected group's rules).

Rule representation (produced by :func:`parse_robots_rules_udf`):
``array<struct<rlen:int, allow:boolean, prefix:string, regex:string>>`` —
``prefix`` is set for plain path rules (the overwhelmingly common case,
matched with ``startswith``) and ``regex`` for rules containing the RFC's
``*`` / ``$`` metacharacters (matched with ``RLIKE``; the Java pattern is
precompiled per rule at parse time, not per page).  ``rlen`` is the original
pattern's octet length — the RFC's longest-match tiebreak key.

Reference semantics: RFC 9309 §2.2 (longest match wins, allow wins length
ties, empty Disallow matches nothing, no match ⇒ allowed); group selection
per §2.2.1 lives in :mod:`wpextract_spark.kernel.robots`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from wpextract_spark.kernel.robots import parse_robots, robots_directives

RULES_TYPE = ArrayType(
    StructType(
        [
            StructField("rlen", IntegerType()),
            StructField("allow", BooleanType()),
            StructField("prefix", StringType()),
            StructField("regex", StringType()),
        ]
    )
)

# Java regex metacharacters.  Escaping is done here (not with re.escape)
# because the pattern is evaluated by the JVM's java.util.regex, whose escape
# rules differ from Python's in the backslash-before-letter cases.
_JAVA_META = set("\\.[]{}()*+?^$|")


def _java_regex(pattern: str) -> str:
    """RFC 9309 pattern -> anchored Java regex.

    ``*`` matches any char run, a trailing ``$`` anchors the end, everything
    else is literal.  A ``$`` anywhere else is literal per the RFC.
    """
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch in _JAVA_META:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored else "")


def _rule_rows(text: str | None, agent: str) -> list[dict] | None:
    if text is None:
        return None  # unknown robots.txt — caller decides the policy
    rows = []
    for rule in parse_robots(text, agent):
        wild = "*" in rule.pattern or rule.pattern.endswith("$")
        rows.append(
            {
                "rlen": len(rule.pattern),
                "allow": rule.allow,
                "prefix": None if wild else rule.pattern,
                "regex": _java_regex(rule.pattern) if wild else None,
            }
        )
    return rows


def parse_robots_rules_udf(agent: str = "*"):
    """(robots_txt) -> parsed rule array for ``agent``'s group.

    Runs over the HOSTS table, never the pages table.  A null robots.txt
    (fetch failed / never fetched) yields a null array so the caller can
    choose fail-open vs fail-closed; an empty or rule-free file yields an
    empty array (= everything allowed, per the RFC).
    """

    @F.pandas_udf(RULES_TYPE)
    def _parse(text: pd.Series) -> pd.Series:
        return text.map(lambda value: _rule_rows(value, agent))

    return _parse


DIRECTIVES_TYPE = StructType(
    [
        # comma-joined rather than array<string>: directive tables feed
        # plain-column sinks/reports, and the sitemap URL list is tiny.
        StructField("sitemaps", StringType()),
        StructField("n_sitemaps", IntegerType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def robots_directives_udf(agent: str = "*"):
    """(robots_txt) -> struct<sitemaps, n_sitemaps, crawl_delay> — the
    non-rule directives a crawl scheduler consumes: sitemap discovery seeds
    and the per-agent politeness delay. Runs over the hosts table."""

    def _one(text):
        if text is None:
            return (None, None, None)
        d = robots_directives(text, agent)
        return (
            ",".join(d["sitemaps"]) if d["sitemaps"] else None,
            len(d["sitemaps"]),
            d["crawl_delay"],
        )

    @F.pandas_udf(DIRECTIVES_TYPE)
    def _directives(text: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(value) for value in text],
            columns=["sitemaps", "n_sitemaps", "crawl_delay"],
        )

    return _directives


def robots_allowed(rules: Column, path: Column) -> Column:
    """RFC 9309 verdict for ``path`` against a parsed rule array — pure JVM.

    Longest-match-wins via ``array_max`` over ``struct(rlen, allow)``
    (Spark's struct ordering is lexicographic and ``true > false``, which is
    exactly the RFC's "allow wins a length tie").  No matching rule — or a
    null rule array — means allowed (fail-open, the reference crawler
    behavior for missing robots.txt; callers wanting fail-closed test
    ``rules.isNull()`` themselves).
    """
    matched = F.filter(
        rules,
        lambda r: F.when(
            r["prefix"].isNotNull(), path.startswith(r["prefix"])
        ).otherwise(F.regexp_like(path, r["regex"])),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(r["rlen"].alias("rlen"), r["allow"].alias("allow")),
        )
    )
    return F.coalesce(best["allow"], F.lit(True))


def filter_robots_allowed(
    pages,
    robots,
    agent: str = "*",
    path_col: str = "path",
    broadcast: bool = True,
):
    """Keep only pages their host's robots.txt allows for ``agent``.

    ``pages`` must carry (``host``, ``path_col``); ``robots`` carries
    (``host``, ``robots_txt``).  The robots side is parsed once per host
    and, by default, broadcast — the pages side then streams through the
    scan stage with zero shuffles.  Pass ``broadcast=False`` when the host
    registry outgrows executor memory (hundreds of millions of hosts): the
    join falls back to a hash-partitioned shuffle on ``host``, where AQE's
    skew splitting handles mega-hosts (the rules side is one row per host,
    so only the probe side skews).  Hosts absent from ``robots`` are kept
    (fail-open).
    """
    rules = robots.select(
        "host", parse_robots_rules_udf(agent)(F.col("robots_txt")).alias("rules")
    )
    if broadcast:
        rules = F.broadcast(rules)
    joined = pages.join(rules, "host", "left")
    return joined.where(robots_allowed(F.col("rules"), F.col(path_col))).drop("rules")

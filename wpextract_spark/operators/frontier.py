"""Crawl-frontier prioritization: one score per URL for the next run.

The capstone of the crawl-ops family: takes the signals the other
operators produce — per-URL change tier
(:func:`wpextract_spark.operators.recrawl.change_rates`), per-host
politeness delay (:func:`wpextract_spark.operators.robots
.robots_directives_udf`), and sitemap-declared freshness
(:func:`wpextract_spark.operators.sitemap.sitemap_udf` ``lastmod``) — and
joins them into the fetch-priority score a scheduler sorts by.

Score model (deterministic, orderable, no clock):
``priority = tier_score * politeness_weight + freshness_bonus`` where
tier_score rewards observed volatility (hot 1.0, new 0.8, warm 0.5,
cool 0.2, static 0.05), ``politeness_weight = 1 / (1 + crawl_delay)``
discounts hosts that throttle us (a 9-second-delay host yields a tenth of
the fetch slots), and a sitemap ``lastmod`` newer than our last fetch adds
0.5 (the site TOLD us it changed — cheaper evidence than any probe).

Plan shape: the politeness table is per-host (broadcast); schedule and
freshness join on url — co-partitioned hash joins on the frontier's own
key. Pure column arithmetic after the joins; no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_SCORES = {"hot": 1.0, "new": 0.8, "warm": 0.5, "cool": 0.2, "static": 0.05}


def frontier_priority(
    urls: DataFrame,
    schedule: DataFrame,
    politeness: DataFrame | None = None,
    freshness: DataFrame | None = None,
) -> DataFrame:
    """(url, host, tier, priority) for every frontier URL.

    ``urls``: (url, host); ``schedule``: (url, tier) from change_rates —
    URLs absent from it default to the ``new`` tier (never observed);
    ``politeness``: (host, crawl_delay) — absent/null delay means no
    throttle; ``freshness``: (url, recently_modified bool) from sitemap
    lastmod vs the last fetch.
    """
    tier_score = F.coalesce(
        *[
            F.when(F.col("tier") == name, F.lit(score))
            for name, score in TIER_SCORES.items()
        ],
        F.lit(TIER_SCORES["new"]),
    )
    out = urls.join(schedule.select("url", "tier"), "url", "left").withColumn(
        "tier", F.coalesce(F.col("tier"), F.lit("new"))
    )
    if politeness is not None:
        out = out.join(
            F.broadcast(politeness.select("host", "crawl_delay")), "host", "left"
        )
    else:
        out = out.withColumn("crawl_delay", F.lit(None).cast("double"))
    if freshness is not None:
        out = out.join(
            freshness.select("url", "recently_modified"), "url", "left"
        )
    else:
        out = out.withColumn("recently_modified", F.lit(None).cast("boolean"))
    weight = F.lit(1.0) / (F.lit(1.0) + F.coalesce(F.col("crawl_delay"), F.lit(0.0)))
    bonus = F.when(F.col("recently_modified"), F.lit(0.5)).otherwise(F.lit(0.0))
    return out.select(
        "url",
        "host",
        "tier",
        F.round(tier_score * weight + bonus, 6).alias("priority"),
    )

"""Frontier prioritization: score composition + plan shape."""

import pytest

from wpextract_spark.operators.frontier import frontier_priority


def _setup(spark):
    urls = spark.createDataFrame(
        [("u1", "fast.com"), ("u2", "slow.com"), ("u3", "fast.com")],
        ["url", "host"],
    )
    schedule = spark.createDataFrame(
        [("u1", "hot"), ("u2", "hot")], ["url", "tier"]
    )  # u3 unobserved -> 'new'
    politeness = spark.createDataFrame(
        [("slow.com", 9.0)], ["host", "crawl_delay"]
    )
    freshness = spark.createDataFrame(
        [("u3", True)], ["url", "recently_modified"]
    )
    return urls, schedule, politeness, freshness


def test_score_composition(spark):
    urls, schedule, politeness, freshness = _setup(spark)
    got = {
        r.url: r
        for r in frontier_priority(urls, schedule, politeness, freshness).collect()
    }
    assert got["u1"].priority == 1.0  # hot, no throttle, no bonus
    assert got["u2"].priority == 0.1  # hot / (1 + 9)
    assert got["u3"].priority == 1.3  # new (0.8) + sitemap bonus 0.5
    assert got["u3"].tier == "new"


def test_optional_inputs_default(spark):
    urls, schedule, _, _ = _setup(spark)
    got = {r.url: r for r in frontier_priority(urls, schedule).collect()}
    assert got["u2"].priority == 1.0  # no politeness table -> no throttle
    assert got["u3"].priority == 0.8  # no freshness table -> no bonus


def test_politeness_is_broadcast(spark):
    urls, schedule, politeness, freshness = _setup(spark)
    out = frontier_priority(urls, schedule, politeness, freshness)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan

"""Recrawl change-rate estimation."""

import pytest

from wpextract_spark.operators.recrawl import change_rates


def _hist(spark, rows):
    return spark.createDataFrame(rows, ["url", "run_id", "fp"])


def test_archetypes(spark):
    rows = []
    for r in range(6):
        rows.append(("static", r, "A"))
        rows.append(("hot", r, f"v{r}"))
        rows.append(("once", r, "x" if r < 3 else "y"))
    rows.append(("new", 0, "z"))
    got = {r.url: r for r in change_rates(_hist(spark, rows)).collect()}

    assert (got["static"].n_changes, got["static"].tier) == (0, "static")
    assert got["static"].change_rate == 0.0
    assert got["static"].last_changed is False

    assert (got["hot"].n_changes, got["hot"].tier) == (5, "hot")
    assert got["hot"].change_rate == 1.0
    assert got["hot"].last_changed is True

    assert (got["once"].n_changes, got["once"].tier) == (1, "warm")
    assert got["once"].change_rate == 0.2
    assert got["once"].last_changed is False

    assert got["new"].n_runs == 1
    assert got["new"].change_rate is None
    assert got["new"].last_changed is None
    assert got["new"].tier == "new"


def test_out_of_order_runs(spark):
    # change detection must follow run order, not insertion order.
    rows = [("u", 2, "b"), ("u", 0, "a"), ("u", 1, "a")]
    got = change_rates(_hist(spark, rows)).collect()[0]
    assert (got.n_runs, got.n_changes) == (3, 1)
    assert got.last_changed is True


def test_cool_tier_boundary(spark):
    # 1 change across 12 observations: rate ~0.0909 < 0.1 -> cool.
    rows = [("u", r, "a" if r < 6 else "b") for r in range(12)]
    got = change_rates(_hist(spark, rows)).collect()[0]
    assert got.tier == "cool"
    assert got.n_changes == 1

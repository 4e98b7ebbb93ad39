"""Bucketed tables: the join between two same-bucketed tables must plan
with zero Exchange operators (the whole point), and results must match the
plain join."""

import pytest

from wpextract_spark.sinks.bucketed import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(500).selectExpr(
        "concat('https://example.org/p', id % 97) AS url", "id AS a_val"
    )
    b = spark.range(300).selectExpr(
        "concat('https://example.org/p', id % 97) AS url", "id AS b_val"
    )
    write_bucketed(a, "t_bucket_a", "url", n_buckets=8)
    write_bucketed(b, "t_bucket_b", "url", n_buckets=8)
    yield spark.table("t_bucket_a"), spark.table("t_bucket_b")
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_join_is_shuffle_free(spark, bucketed_pair):
    # hint("merge") models the corpus-scale case where neither side fits a
    # broadcast — the situation bucketing exists for (the tiny test tables
    # would otherwise auto-broadcast).
    ta, tb = bucketed_pair
    joined = ta.hint("merge").join(tb, "url")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_join_results_match_plain_join(spark, bucketed_pair):
    ta, tb = bucketed_pair
    plain = (
        spark.range(500)
        .selectExpr("concat('https://example.org/p', id % 97) AS url", "id AS a_val")
        .join(
            spark.range(300).selectExpr(
                "concat('https://example.org/p', id % 97) AS url", "id AS b_val"
            ),
            "url",
        )
    )
    got = sorted(map(tuple, ta.join(tb, "url").collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want and got


def test_aggregation_on_bucket_key_is_shuffle_free(spark, bucketed_pair):
    ta, _ = bucketed_pair
    plan = (
        ta.groupBy("url").count()._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_rejects_bad_bucket_count(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(1), "t_x", "id", n_buckets=0)

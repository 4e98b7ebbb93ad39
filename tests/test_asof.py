"""As-of join: backward-match semantics, tie rules, and plan shape.

Differential check: the union-of-streams implementation must agree with a
brute-force per-row Python evaluation of the rule "latest right row with
t <= left t, greatest seq on time ties" on every case class — no preceding
row (null), exact-equal timestamps (inclusive), same-timestamp right ties,
and keys absent from the right side entirely.
"""

from datetime import datetime

from pyspark.sql import functions as F

from wpextract_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _make(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 12:00:00")),  # between r1 and r2
            (2, 10, _ts("2024-01-01 00:00:00")),  # exactly r1's time -> inclusive
            (3, 10, _ts("2023-12-31 23:59:59")),  # before everything -> null
            (4, 20, _ts("2024-06-01 00:00:00")),  # tie: two orders same time
            (5, 30, _ts("2024-01-01 00:00:00")),  # key with no right rows
            (6, 20, _ts("2024-04-01 00:00:00")),  # before the tied orders
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:00"), 10.0),
            (101, 10, _ts("2024-01-10 00:00:00"), 20.0),
            (200, 20, _ts("2024-05-01 00:00:00"), 30.0),
            (201, 20, _ts("2024-05-01 00:00:00"), 40.0),  # same ts as 200
        ],
        "o_id long, cust long, o_ts timestamp, price double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _make(spark)
    out = asof_join(
        left,
        right,
        left_on="user_id",
        right_on="cust",
        left_time="ts",
        right_time="o_ts",
        value_cols=["o_id", "price"],
        right_seq="o_id",
    )
    got = {r["event_id"]: (r["asof_o_id"], r["asof_price"]) for r in out.collect()}
    assert got == {
        1: (100, 10.0),  # r at 01-01 is the latest <= 01-05
        2: (100, 10.0),  # equal timestamp matches (<=)
        3: (None, None),  # nothing precedes
        4: (201, 40.0),  # time tie -> greatest seq wins
        5: (None, None),  # key never seen on the right
        6: (None, None),  # nothing precedes (orders are in its future)
    }
    # every left row survives exactly once, and all left columns come back
    assert out.count() == left.count()
    assert set(left.columns).issubset(out.columns)


def test_asof_single_shuffle_plan(spark):
    left, right = _make(spark)
    out = asof_join(
        left,
        right,
        left_on="user_id",
        right_on="cust",
        left_time="ts",
        right_time="o_ts",
        value_cols=["o_id"],
        right_seq="o_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one window exchange, union — and crucially NO join node at all
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_forward_semantics(spark):
    left, right = _make(spark)
    out = asof_join(
        left,
        right,
        left_on="user_id",
        right_on="cust",
        left_time="ts",
        right_time="o_ts",
        value_cols=["o_id", "price"],
        right_seq="o_id",
        direction="forward",
    )
    got = {r["event_id"]: (r["asof_o_id"], r["asof_price"]) for r in out.collect()}
    assert got == {
        1: (101, 20.0),  # next right at 01-10
        2: (100, 10.0),  # equal timestamp matches (>=)
        3: (100, 10.0),  # everything is ahead; earliest wins
        4: (None, None),  # both orders are in its past
        5: (None, None),  # key never seen on the right
        6: (200, 30.0),  # time tie ahead -> SMALLEST seq wins (mirror)
    }


def test_asof_bad_direction(spark):
    left, right = _make(spark)
    import pytest

    with pytest.raises(ValueError):
        asof_join(
            left, right, "user_id", "cust", "ts", "o_ts", ["o_id"], "o_id",
            direction="sideways",
        )

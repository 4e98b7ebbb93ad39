"""Stream-stream interval join: streamed result equals the identical join
expression in batch; out-of-window and cross-user pairs excluded."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from wpextract_spark.streaming.join_stream import (
    EVENTS_SCHEMA,
    click_purchase_join,
    run_attribution_stream,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + timedelta(seconds=s), v) for i, (u, s, v) in enumerate(rows)],
        EVENTS_SCHEMA,
    )


def _sides(df):
    clicks = df.select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = df.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    return clicks, purchases


def test_stream_join_matches_batch(spark, tmp_path):
    clicks = [(1, 0, 0.0), (1, 7200, 0.0), (2, 0, 0.0)]
    purchases = [
        (1, 30, 5.0),     # inside click 0's hour
        (1, 3600, 7.0),   # exactly at the bound -> included
        (1, 3601, 9.0),   # past click 0's hour, inside click 1's? no (7200) -> matches neither
        (2, 1800, 11.0),  # user 2
        (3, 10, 13.0),    # user with no clicks
    ]
    cdf, pdf = _df(spark, clicks), _df(spark, purchases)
    cdf.coalesce(1).write.parquet(str(tmp_path / "clicks"))
    pdf.coalesce(1).write.parquet(str(tmp_path / "purch"))

    q = run_attribution_stream(
        spark,
        str(tmp_path / "clicks"),
        str(tmp_path / "purch"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        (r["c_id"], r["p_id"]): r["p_value"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        (r["c_id"], r["p_id"]): r["p_value"]
        for r in click_purchase_join(_sides(cdf)[0], _sides(pdf)[1]).collect()
    }
    assert got == batch
    assert got == {(0, 0): 5.0, (0, 1): 7.0, (2, 3): 11.0}


def test_stream_join_matches_oracled_range_join(spark, tmp_path):
    """Equivalence against operators/rangejoin.py — the DRIVER-ORACLED
    batch band join (q_range_join; both bounds inclusive, same contract as
    the attribution window) — not merely the same join expression run in
    batch."""
    from wpextract_spark.operators.rangejoin import range_join

    clicks = [(1, 0, 0.0), (1, 7200, 0.0), (2, 0, 0.0), (3, 50, 0.0)]
    purchases = [
        (1, 30, 5.0),
        (1, 3600, 7.0),   # exactly at the +1h bound: both must include it
        (1, 3601, 9.0),   # just past it: both must exclude it
        (1, 7300, 15.0),  # inside click 1's window
        (2, 1800, 11.0),
        (4, 10, 13.0),    # user with no clicks
    ]
    cdf, pdf = _df(spark, clicks), _df(spark, purchases)
    cdf.coalesce(1).write.parquet(str(tmp_path / "clicks"))
    pdf.coalesce(1).write.parquet(str(tmp_path / "purch"))

    q = run_attribution_stream(
        spark,
        str(tmp_path / "clicks"),
        str(tmp_path / "purch"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        (r["c_id"], r["p_id"]): r["p_value"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    c_side, p_side = _sides(cdf)[0], _sides(pdf)[1]
    banded = {
        (r["c_id"], r["p_id"]): r["p_value"]
        for r in range_join(
            c_side, p_side, "c_user", "p_user", "c_ts", "p_ts", 3600
        ).collect()
    }
    assert got == banded
    assert (0, 1) in got and (0, 2) not in got  # inclusive upper bound
    assert (1, 3) in got

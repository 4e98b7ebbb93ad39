"""Watermarked stream-stream interval join: clicks x purchases attribution.

The last piece of the Structured Streaming surface next to stateful dedup,
running domain metrics, and session windows: joining TWO live streams on a
key plus an event-time interval (each click matched to the same user's
purchases within the following hour — ad-attribution shape). Spark buffers
both sides in the state store; the join's time-range condition plus the
two watermarks bound that state — a click older than (purchase watermark -
interval) can never match a future purchase, so the engine evicts it.
Without the time bound the state would grow forever; the range condition
is what makes a stream-stream join runnable at all.

Inner joins emit as soon as both sides arrive; rows are final (append
mode) because late data beyond the watermark is dropped on ingest. The
test pins the streamed result against the identical join expression run in
batch over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the events file streams the demo/test source reads.
EVENTS_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
) -> DataFrame:
    """Join each click to same-user purchases within ``attribution_window``
    after it (inclusive bounds). Works identically on streaming and batch
    DataFrames — tests exploit this for stream-vs-batch equivalence.

    Inputs must carry distinct column names per side (see the ``c_``/``p_``
    prefixes in :func:`run_attribution_stream`).
    """
    return clicks.join(
        purchases,
        F.expr(
            f"""
            c_user = p_user AND
            p_ts >= c_ts AND
            p_ts <= c_ts + INTERVAL {attribution_window}
            """
        ),
        "inner",
    ).select("c_id", "c_user", "c_ts", "p_id", "p_ts", "p_value")


def run_attribution_stream(
    spark,
    clicks_dir: str,
    purchases_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    attribution_window: str = "1 hour",
    watermark: str = "0 seconds",
):
    """File-source click and purchase streams -> interval join -> parquet.

    Both sides are watermarked; the engine derives each side's state
    retention from the watermark plus the join's time bounds. availableNow
    drains everything present and stops (inner-join rows don't wait for
    watermark closure — they emit as soon as both inputs arrive).
    """
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(clicks_dir)
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(purchases_dir)
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = click_purchase_join(clicks, purchases, attribution_window)
    return (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

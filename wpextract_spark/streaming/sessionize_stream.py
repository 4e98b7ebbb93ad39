"""Streaming sessionization: watermarked session windows over an event stream.

The streaming counterpart of ``operators/sessionize.py``, built on Spark's
NATIVE session windows (``F.session_window``) rather than a custom stateful
UDF: the engine keeps one in-flight window per (key, open session), merges
windows as late-but-in-watermark events arrive, and emits a session exactly
once — in append mode — when the event-time watermark passes the session's
close (last event + gap). State is bounded by the watermark: closed
sessions leave the state store, so a perpetual stream holds state
proportional to *active* keys only, not history.

Boundary semantics differ from the batch operator by design and are pinned
in tests: ``session_window`` treats a session as the half-open interval
``[first_event, last_event + gap)`` and merges only OVERLAPPING intervals,
so an event arriving exactly ``gap`` after the previous one starts a new
session (batch ``sessionize`` lets it extend, ``> gap`` rule). Tests
therefore compare the stream against the *same* session_window expression
evaluated in batch mode — Spark guarantees those two agree, and that
equivalence (not the UDF-free batch operator) is the correctness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the events file stream the demo/test source reads.
EVENTS_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def session_rollups(
    events: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    gap: str = "30 minutes",
    value: str = "value",
) -> DataFrame:
    """Session rollups per (key, session window) — one row per closed
    session in streaming append mode; identical expression works on a batch
    DataFrame (tests exploit this for stream-vs-batch equivalence).
    """
    return (
        events.groupBy(F.col(key), F.session_window(F.col(time), gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 6).alias("sum_value"),
        )
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_session_stream(
    spark,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    time: str = "ts",
    gap: str = "30 minutes",
    value: str = "value",
    watermark: str = "0 seconds",
    max_files_per_trigger: int = 1,
):
    """File-source session stream -> parquet sink (append mode).

    ``max_files_per_trigger=1`` makes each input file its own micro-batch so
    the watermark advances between files — an availableNow drain then emits
    every session closed by later files' event times. Exactly-once across
    restarts comes from the checkpointed file-source offsets + sink manifest,
    same as ``extract_stream.run_file_stream``.
    """
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
        .withWatermark(time, watermark)
    )
    rollups = session_rollups(events, key=key, time=time, gap=gap, value=value)
    query = (
        rollups.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query

"""Streaming session windows: closed sessions match the identical
session_window expression run in batch; open sessions stay unemitted."""

from datetime import datetime, timedelta

from wpextract_spark.streaming.sessionize_stream import (
    EVENTS_SCHEMA,
    run_session_stream,
    session_rollups,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + timedelta(seconds=s), v) for i, (u, s, v) in enumerate(rows)],
        EVENTS_SCHEMA,
    )


def test_stream_sessions_match_batch(spark, tmp_path):
    rows = [
        (1, 0, 1.0),
        (1, 60, 2.0),      # same session as above
        (1, 60 + 2000, 4.0),  # > 30min gap -> second session
        (2, 30, 8.0),      # other user
    ]
    _df(spark, rows).coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
    # Sentinel file, far-future event: its OWN micro-batch (maxFilesPerTrigger
    # =1) advances the watermark past every real session's close.
    _df(spark, [(99, 10 * 86400, 0.0)]).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in")
    )

    q = run_session_stream(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        gap="30 minutes",
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # the same expression over the same rows in BATCH mode, sentinel excluded
    # (its session never closes in the stream)
    expected = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in session_rollups(_df(spark, rows), gap="30 minutes").collect()
    }
    assert got == expected
    assert len(got) == 3
    # and the rollup values themselves
    assert got[(1, T0)] == (2, 3.0)
    assert got[(2, T0 + timedelta(seconds=30))] == (1, 8.0)

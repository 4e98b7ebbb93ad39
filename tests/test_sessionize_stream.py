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


def test_stream_sessions_match_oracled_batch_operator(spark, tmp_path):
    """Equivalence against operators/sessionize.py — the DRIVER-ORACLED
    batch operator (q_sessionize) — not merely the same expression run in
    batch. Valid on boundary-free data: no event arrives exactly `gap`
    after its session predecessor (the one documented semantic difference
    between session_window and the batch > gap rule). Stream session_end
    is last_event + gap by definition; batch session_end is last_event."""
    from datetime import timedelta

    from wpextract_spark.operators.sessionize import sessionize

    rows = []
    for u in range(4):
        base = u * 11  # desynchronize users
        for s in (0, 120, 500, 2500, 2620, 9000):  # gaps: 2 sessions splits
            rows.append((u, base + s, float(u * 100 + s % 97)))
    _df(spark, rows).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in")
    )
    _df(spark, [(99, 10 * 86400, 0.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(tmp_path / "in"))

    q = run_session_stream(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        gap="30 minutes",
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"],
            r["sum_value"],
            r["session_end"],
        )
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): (
            r["n_events"],
            r["sum_value"],
            r["session_end"],
        )
        for r in sessionize(
            _df(spark, rows), "user_id", "ts", 1800, value="value"
        ).collect()
    }
    assert len(got) == len(batch) == 4 * 3
    for key, (n, sv, end) in batch.items():
        g_n, g_sv, g_end = got[key]
        assert (g_n, g_sv) == (n, sv)
        assert g_end == end + timedelta(seconds=1800)

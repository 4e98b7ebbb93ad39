"""Event-time as-of join — the classic operator Spark's join family lacks.

``asof_join(left, right)`` attaches, to every left row, the single most
recent right row whose time is ``<=`` the left row's time within the same
key (a backward as-of join: "what was the last order this user had placed
when this event fired?"), or with ``direction="forward"`` the earliest
right row at-or-after it ("time to next purchase"). kdb+/pandas call this
``aj`` / ``merge_asof``; DuckDB ships it as ``ASOF JOIN``. Spark has no
native form, and the naive encodings are scale-traps:

- range-predicate join (``l.key = r.key AND r.t <= l.t``) degenerates to a
  per-key cross product that a window/row_number then prunes — quadratic in
  per-key row count, fatal for a mega-user at 100 TB;
- broadcast of the right side assumes the dimension is small — an as-of
  right side (orders, quotes, sensor states) usually is NOT.

This implementation is the union-of-streams pattern instead: tag both
sides, union them into one (key, time)-ordered stream, and carry the most
recent right-side payload forward with ``last(..., ignorenulls=True)`` over
a running window. Cost: ONE shuffle (the window's partition-by-key
exchange), state O(1) per row — the same running-value scan at any scale,
no pair blow-up. Skewed keys affect only partition balance (a key's rows
must sort together, as in any per-key ordered computation); the window
itself never materializes per-key pairs.

Determinism: right rows sort before left rows at an equal timestamp (so a
right row AT the left time is matched, the ``<=`` convention), and ties
between right rows at the same (key, time) resolve to the greatest
``right_seq`` — mirrored in the SQL oracle's ``ORDER BY t DESC, seq DESC
LIMIT 1`` lateral.

No reference counterpart (wpextract has no temporal joins); included as a
core training-/analytics-pipeline primitive per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Sort tag: right-side (state) rows first at an equal timestamp.
_RIGHT, _LEFT = 0, 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_seq: str,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join per key: ``backward`` (default) attaches the latest right
    row with ``right_time <= left_time``; ``forward`` the earliest right row
    with ``right_time >= left_time`` (both bounds inclusive).

    Returns every ``left`` column plus ``{prefix}{c}`` for each of
    ``value_cols`` (null when no right row qualifies).

    ``right_seq`` breaks ties between right rows sharing (key, time)
    deterministically: backward picks the GREATEST seq, forward the
    SMALLEST (each is the mirror-ordered scan's last-seen row) — pick a
    unique id so the result is total-order deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(*[F.col(c) for c in value_cols]).alias("_rv")
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(_RIGHT).alias("_tag"),
        F.col(right_seq).cast("long").alias("_seq"),
        payload,
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}") for t in left.schema],
    )
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(_LEFT).alias("_tag"),
        F.lit(None).cast("long").alias("_seq"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(t.name).alias(f"_l_{t.name}") for t in left.schema],
    )
    # One ordered stream per key; rows at equal _t order right-before-left
    # (tag), right-vs-right by seq so `last` lands on the winning seq.
    # Forward is the time-mirrored scan: descending time, descending seq.
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_tag").asc(), F.col("_seq").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_tag").asc(), F.col("_seq").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"_l_{t.name}").alias(t.name) for t in left.schema]
    out_vals = [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return carried.where(F.col("_tag") == _LEFT).select(*out_left, *out_vals)

"""Gap-based sessionization: assign events to sessions, emit session rollups.

The classic clickstream operator: within a key (user, device, domain), an
event starts a NEW session when more than ``gap`` elapses since the previous
event; otherwise it extends the current one. The standard distributed
encoding is two stacked windows over ONE partition-by-key exchange:

1. ``lag(time)`` per key ordered by time → inter-event gap;
2. running ``sum(gap > threshold)`` over the same window spec → session
   ordinal (Catalyst fuses both into a single Window node, so there is
   exactly one shuffle and one sort).

The per-key state is O(1) (previous timestamp + running counter), so the
plan survives any corpus size; skew is bounded by the largest single key
(a per-key ordered computation's intrinsic floor), never by pair blow-up.
Session rollups then reuse the same hash partitioning: grouping by
(key, session_seq) is a strict refinement of the window's partitioning, so
AQE/EnsureRequirements keeps it local — no second exchange of the events.

No reference counterpart (wpextract has no event-time operators); included
as a core analytics primitive per the build brief, mirrored 1:1 by a SQL
window oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Microseconds since epoch. The NTZ->TIMESTAMP cast reads an NTZ value
    as session-local; every use here is a DIFFERENCE of two such readings,
    so the (constant) session-offset shift cancels and the result is exact
    for TIMESTAMP and TIMESTAMP_NTZ inputs alike."""
    return F.unix_micros(col.cast("timestamp"))


def assign_sessions(
    events: DataFrame,
    key: str,
    time: str,
    gap_seconds: int,
) -> DataFrame:
    """Tag every event with ``session_seq`` (1-based ordinal of its session
    within ``key``, by time order).

    An event opens a new session iff it is the key's first event or strictly
    more than ``gap_seconds`` after the previous one (boundary convention:
    a gap of exactly ``gap_seconds`` still extends the session — mirrored in
    the oracle's ``> gap``). Gap arithmetic is microsecond-exact
    (``unix_micros``): second-truncating casts would both lose real gaps and
    diverge from any SQL engine's interval arithmetic.
    """
    w = Window.partitionBy(key).orderBy(F.col(time).asc())
    prev = F.lag(F.col(time)).over(w)
    is_new = (
        prev.isNull()
        | (_us(F.col(time)) - _us(prev) > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("long")
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def sessionize(
    events: DataFrame,
    key: str,
    time: str,
    gap_seconds: int,
    value: str | None = None,
) -> DataFrame:
    """Session rollups: one row per (key, session_seq) with start/end times,
    event count, duration in seconds, and (optionally) the summed ``value``.

    Single shuffle end-to-end: the groupBy key (key, session_seq) refines the
    window's hashpartitioning(key), so the aggregation runs on the window's
    output partitioning without a second exchange.
    """
    tagged = assign_sessions(events, key, time, gap_seconds)
    aggs = [
        F.min(time).alias("session_start"),
        F.max(time).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_us(F.col(time))) - F.min(_us(F.col(time)))).alias("duration_us"),
    ]
    if value is not None:
        aggs.append(F.round(F.sum(value), 6).cast("double").alias("sum_value"))
    return tagged.groupBy(key, "session_seq").agg(*aggs)

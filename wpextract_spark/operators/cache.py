"""Session-scoped registry for operator-internal persisted DataFrames.

Some operators persist small intermediate tables that the RETURNED plan
still reads (e.g. :func:`collocations`' vocabulary-sized count tables) —
they cannot be unpersisted inside the operator without forcing an eager
action, but left untracked they accumulate MEMORY_AND_DISK blocks across
repeated calls in a long-lived session until LRU pressure evicts them.

Operators register such frames with :func:`track`; callers (the query
registry, ``bench.py``, long-lived notebook sessions) call
:func:`release` after consuming the result to drop the blocks
deterministically. ``release`` is safe at any time — unpersisting a frame
whose blocks are gone is a no-op, and a tracked frame consumed lazily
after release simply recomputes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

_TRACKED: list[tuple[str, DataFrame]] = []


def track(df: DataFrame, scope: str) -> DataFrame:
    """Register an already-persisted frame for later :func:`release`."""
    _TRACKED.append((scope, df))
    return df


def release(scope: Optional[str] = None) -> int:
    """Unpersist every tracked frame (or only ``scope``'s); returns count."""
    global _TRACKED
    kept: list[tuple[str, DataFrame]] = []
    dropped = 0
    for s, df in _TRACKED:
        if scope is None or s == scope:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — blocks are gone anyway
            dropped += 1
        else:
            kept.append((s, df))
    _TRACKED = kept
    return dropped

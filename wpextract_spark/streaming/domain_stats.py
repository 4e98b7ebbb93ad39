"""Stateful streaming per-domain crawl metrics.

The second custom stateful operator pattern next to the boolean-state dedup
(``dedup_stream.py``): here the per-key state is a *running aggregate* —
(docs seen, chars seen, first/last crawl timestamp) per domain — updated
every micro-batch and re-emitted with the new totals, the streaming analog
of the per-partition lineage counters the batch job writes
(``plans/job.py``). Mega-site domains each own one state row, so state is
O(distinct domains) and idle domains are evicted by the state timeout.

Batch-equivalent semantics via :func:`domain_stats_batch` (a plain groupBy)
pin the streamed totals in tests.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output: the running totals per domain as of this micro-batch.
DOMAIN_STATS_SCHEMA = (
    "domain string, n_docs long, total_chars long, first_ts long, last_ts long"
)
_STATE_SCHEMA = "n_docs long, total_chars long, first_ts long, last_ts long"

_DOMAIN_RE = r"(?i)^https?://([^/]+)"


def _with_domain(pages: DataFrame, text_col: str) -> DataFrame:
    return pages.select(
        # Case-insensitive scheme match + lowercased host: 'HTTP://Example.com'
        # and 'http://example.com' are the same domain, not '' and two keys.
        F.lower(F.regexp_extract("url", _DOMAIN_RE, 1)).alias("domain"),
        # NULL text counts as 0 chars at the source so the streamed running
        # total and the batch groupBy sum agree even for all-NULL domains.
        F.coalesce(F.length(F.col(text_col)).cast("long"), F.lit(0)).alias("n_chars"),
        F.unix_timestamp("warc_ts").alias("ts"),
    )


def _domain_stats_fn(
    key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # Idle-domain eviction: drop the state row, emit nothing.
        state.remove()
        for _ in batches:
            pass
        return
    n_docs, total_chars, first_ts, last_ts = (
        state.get if state.exists else (0, 0, None, None)
    )
    seen_any = False
    for batch in batches:
        if not len(batch):
            continue
        seen_any = True
        n_docs += len(batch)
        total_chars += int(batch["n_chars"].fillna(0).sum())
        ts = batch["ts"].dropna()  # null warc_ts rows count but carry no time
        if len(ts):
            ts_min, ts_max = int(ts.min()), int(ts.max())
            first_ts = ts_min if first_ts is None else min(first_ts, ts_min)
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    if not seen_any:
        return
    state.update((n_docs, total_chars, first_ts, last_ts))
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict idle domains after a day
    yield pd.DataFrame(
        [
            {
                "domain": key[0],
                "n_docs": n_docs,
                "total_chars": total_chars,
                "first_ts": first_ts,
                "last_ts": last_ts,
            }
        ]
    )


def domain_stats_stream(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming: running (n_docs, total_chars, first/last ts) per domain,
    one updated row per domain per micro-batch it appears in."""
    return (
        _with_domain(pages, text_col)
        .groupBy("domain")
        .applyInPandasWithState(
            _domain_stats_fn,
            outputStructType=DOMAIN_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def domain_stats_batch(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch-equivalent totals (what the stream's last emission per domain
    must converge to)."""
    return (
        _with_domain(pages, text_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )

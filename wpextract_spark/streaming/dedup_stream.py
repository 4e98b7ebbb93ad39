"""Stateful streaming dedup: emit each content hash's first document only.

The batch dedup family (operators/dedup.py) needs the whole corpus; on a
stream, "have I seen this content before?" is per-key state. This is the
custom stateful operator pattern (``applyInPandasWithState``): group by
content hash, keep one boolean per key in the state store, emit a row only
when its key is new. State is bounded by ``GroupStateTimeout`` — an idle
hash's state is dropped after the timeout, trading exactness for bounded
state exactly like a near-dup cache at corpus scale.

Works identically on a batch DataFrame via :func:`first_seen_batch` (the
same groupBy semantics without a state store), which the test uses to pin
semantics, while the streaming path is exercised through a real
``readStream`` query.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema of the streaming dedup: the surviving documents.
DEDUP_OUTPUT_SCHEMA = "text_hash string, url string, warc_ts timestamp_ntz"
_STATE_SCHEMA = "seen boolean"


def _first_seen_fn(
    key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # Idle-key eviction: actually drop the state row (a timed-out call
        # that merely returns would leave the row alive forever).
        state.remove()
        for _ in batches:
            pass
        return
    if state.exists:
        # Hash already emitted in a previous micro-batch: drop everything.
        # Re-arm the eviction timeout — GroupState timeouts must be set on
        # EVERY invocation or the row's timeout is cleared and it lives
        # forever (the key just proved it's not idle, so extend it).
        state.setTimeoutDuration(3600 * 1000)
        for _ in batches:
            pass
        return
    first: pd.DataFrame | None = None
    for batch in batches:
        if not len(batch):
            continue
        # Earliest (warc_ts, url) wins across ALL chunks of the micro-batch
        # (a key's rows may arrive split over several DataFrames).
        # na_position='first' matches the batch reference's Spark ascending
        # sort, where NULL timestamps order before every real one.
        head = batch.sort_values(["warc_ts", "url"], na_position="first").head(1)
        if first is None:
            first = head
        else:
            first = pd.concat([first, head]).sort_values(
                ["warc_ts", "url"], na_position="first"
            ).head(1)
    if first is None:
        return
    state.update((True,))
    state.setTimeoutDuration(3600 * 1000)  # drop idle keys after an hour
    yield first[["text_hash", "url", "warc_ts"]]


def first_seen_stream(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming: one output row per distinct content hash (its first doc).

    Input: a streaming pages DataFrame. The shuffle keys on the content
    hash, so each hash's state lives on exactly one partition; AQE-less
    streaming sizes state-store partitions via spark.sql.shuffle.partitions.
    """
    hashed = pages.select(
        F.md5(F.col(text_col)).alias("text_hash"), "url", "warc_ts"
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def first_seen_batch(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch reference semantics for the streaming operator (one run =
    one giant micro-batch): earliest (warc_ts, url) row per content hash."""
    from pyspark.sql import Window

    hashed = pages.select(
        F.md5(F.col(text_col)).alias("text_hash"), "url", "warc_ts"
    )
    w = Window.partitionBy("text_hash").orderBy(F.asc("warc_ts"), F.asc("url"))
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

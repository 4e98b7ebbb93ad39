"""Streaming near-duplicate filter: a SimHash cache with per-bucket state.

Batch near-dup (``operators/dedup.py::simhash_near_dup_pairs``) compares all
pairs within LSH buckets; a stream needs the *online* form: "is this new
document within Hamming distance h of anything recently seen?". This is the
streaming LSH-cache design used by crawl dedup at ingest time:

* group by the first ``prefix_bits`` of the 64-bit SimHash — near-identical
  documents share the prefix with high probability, so each state-store key
  holds a small neighborhood;
* per key, keep the last ``max_cached`` (id, signature) pairs; a new
  document is flagged as a near-dup if any cached signature is within
  ``max_hamming`` bits, then (if novel) enters the cache;
* idle buckets are evicted by state timeout — the cache is a sliding
  window over the stream, which is the semantics ingest dedup wants
  (yesterday's boilerplate eventually ages out).

Recall tradeoff, stated plainly: a near-dup pair differing inside the
prefix window lands in different buckets and is missed — the standard
streaming-LSH compromise (multi-probe = run R parallel queries on rotated
signatures). Precision is exact: every flagged pair really is within
``max_hamming`` (verified bitwise, not by bucket membership).

Signature computation is the batch operator's (same hash family), so a
document's signature is identical in both engines; the batch-reference
function pins the sequential semantics for tests.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wpextract_spark.operators.dedup import simhash_expr

#: Output: every input doc with its verdict (append-mode friendly).
NEARDUP_OUTPUT_SCHEMA = (
    "doc_id long, simhash_bits string, is_near_dup boolean, matched_id long"
)
#: State: parallel comma-joined lists (ids, signatures-as-ints). Flat
#: strings rather than array columns keep the state row fixed-shape across
#: Spark state-store encodings.
_STATE_SCHEMA = "ids string, sigs string"

_TIMEOUT_MS = 3600 * 1000


def _popcount64(arr):
    """Vectorized 64-bit popcount (SWAR), elementwise over a uint64 array."""
    import numpy as np

    v = arr.astype(np.uint64, copy=True)
    v -= (v >> np.uint64(1)) & np.uint64(0x5555555555555555)
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _neardup_fn_factory(max_hamming: int, max_cached: int):
    def fn(
        key: Tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            for _ in batches:
                pass
            return
        if state.exists:
            ids_s, sigs_s = state.get
            cache_ids = [int(v) for v in ids_s.split(",") if v]
            cache_sigs = [int(v) for v in sigs_s.split(",") if v]
        else:
            cache_ids, cache_sigs = [], []
        rows = pd.concat(list(batches), ignore_index=True)
        if not len(rows):
            state.setTimeoutDuration(_TIMEOUT_MS)
            return
        # Deterministic arrival order within the micro-batch.
        rows = rows.sort_values("doc_id")
        import numpy as np

        sigs = np.array(
            [int(s, 2) for s in rows["simhash_bits"]], dtype=np.uint64
        )
        doc_ids = rows["doc_id"].to_numpy(dtype=np.int64)
        n = len(sigs)
        out_match = [None] * n
        # Phase 1, vectorized: every row against the pre-batch cache at once
        # (one XOR + popcount matrix). First hit in cache order wins, same as
        # the sequential scan it replaces.
        if cache_sigs:
            cache_arr = np.array(cache_sigs, dtype=np.uint64)
            hits = _popcount64(sigs[:, None] ^ cache_arr[None, :]) <= max_hamming
            hit_rows = np.nonzero(hits.any(axis=1))[0]
            first = hits.argmax(axis=1)
            for i in hit_rows:
                out_match[i] = cache_ids[first[i]]
        # Phase 2: rows that missed the cache carry a true data dependency —
        # each may match a *novel* signature added earlier in this batch —
        # so chain only those, each compared vectorized against the novel
        # set (usually a handful of rows).
        new_ids: list[int] = []
        new_sigs: list[int] = []
        for i in range(n):
            if out_match[i] is not None:
                continue
            if new_sigs:
                h = (
                    _popcount64(sigs[i] ^ np.array(new_sigs, dtype=np.uint64))
                    <= max_hamming
                )
                if h.any():
                    out_match[i] = new_ids[int(h.argmax())]
                    continue
            new_ids.append(int(doc_ids[i]))
            new_sigs.append(int(sigs[i]))
        cache_ids.extend(new_ids)
        cache_sigs.extend(new_sigs)
        out_dup = [m is not None for m in out_match]
        # Sliding cache: newest survivors win.
        cache_ids, cache_sigs = cache_ids[-max_cached:], cache_sigs[-max_cached:]
        state.update(
            (
                ",".join(map(str, cache_ids)),
                ",".join(map(str, cache_sigs)),
            )
        )
        state.setTimeoutDuration(_TIMEOUT_MS)
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"].to_numpy(),
                "simhash_bits": rows["simhash_bits"].to_numpy(),
                "is_near_dup": out_dup,
                "matched_id": pd.array(out_match, dtype="Int64"),
            }
        )

    return fn


def _signed(docs: DataFrame, id_col: str, text_col: str, prefix_bits: int) -> DataFrame:
    # Per-row signature expression (no shuffle): a groupBy-based signature
    # would be a second stateful operator, which streaming disallows.
    sig = simhash_expr(text_col, bits=64)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        sig.alias("simhash_bits"),
        F.substring(sig, 1, prefix_bits).alias("_bucket"),
    )


def neardup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    max_cached: int = 128,
) -> DataFrame:
    """Streaming: every document annotated with (is_near_dup, matched_id)
    against the sliding per-bucket SimHash cache."""
    return _signed(docs, id_col, text_col, prefix_bits).groupBy("_bucket").applyInPandasWithState(
        _neardup_fn_factory(max_hamming, max_cached),
        outputStructType=NEARDUP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def neardup_batch(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    max_cached: int = 128,
) -> DataFrame:
    """Batch reference semantics: one run == one giant micro-batch (state
    starts empty, docs scan in id order per bucket)."""
    fn = _neardup_fn_factory(max_hamming, max_cached)

    def wrap(pdf: pd.DataFrame) -> pd.DataFrame:
        class _NoState:
            hasTimedOut = False
            exists = False

            def update(self, v):
                pass

            def setTimeoutDuration(self, ms):
                pass

            def remove(self):
                pass

        outs = list(fn(("",), iter([pdf]), _NoState()))
        return outs[0] if outs else pd.DataFrame(
            columns=["doc_id", "simhash_bits", "is_near_dup", "matched_id"]
        )

    return (
        _signed(docs, id_col, text_col, prefix_bits)
        .groupBy("_bucket")
        .applyInPandas(wrap, NEARDUP_OUTPUT_SCHEMA)
    )

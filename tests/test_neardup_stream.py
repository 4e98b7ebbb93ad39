"""Streaming SimHash near-dup cache: verdict correctness on crafted docs,
batch==stream parity, cross-micro-batch state, and cache-cap behavior."""

import pandas as pd
import pytest

from wpextract_spark.streaming.neardup_stream import neardup_batch, neardup_stream


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "bottles hang quietly on the old stone wall near the river crossing"
)
# One-word tweak: a handful of simhash bits flip -> near-dup of BASE.
TWEAK = BASE.replace("green", "blue")
OTHER = (
    "completely different subject matter entirely numbers statistics "
    "report quarterly earnings growth revenue margin forecast guidance"
)


def test_batch_verdicts(spark):
    out = {
        r["doc_id"]: r
        for r in neardup_batch(
            _docs(spark, [(1, BASE), (2, TWEAK), (3, OTHER)]), max_hamming=12
        ).collect()
    }
    assert not out[1]["is_near_dup"]           # first arrival is novel
    assert out[2]["is_near_dup"] and out[2]["matched_id"] == 1
    assert not out[3]["is_near_dup"]


def test_flag_is_bitwise_not_bucket(spark):
    # same bucket is NOT enough: OTHER shares no near signature with BASE,
    # and must not be flagged even when prefix_bits=0 puts all docs in one
    # bucket.
    out = {
        r["doc_id"]: r["is_near_dup"]
        for r in neardup_batch(
            _docs(spark, [(1, BASE), (2, OTHER)]), max_hamming=3, prefix_bits=0
        ).collect()
    }
    assert not out[2]


def test_cache_cap_evicts_oldest(spark):
    rows = [(i, f"{OTHER} variant {i}") for i in range(1, 5)] + [(10, BASE), (11, BASE)]
    # cap 1: only the newest survivor is cached; doc 11 still matches 10
    out = {
        r["doc_id"]: r
        for r in neardup_batch(
            _docs(spark, rows), max_hamming=0, prefix_bits=0, max_cached=1
        ).collect()
    }
    assert out[11]["is_near_dup"] and out[11]["matched_id"] == 10


def test_stream_matches_batch_and_state_crosses_microbatches(spark, tmp_path):
    import time

    schema = "doc_id long, text string"
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    # micro-batch 1: BASE; micro-batch 2 (new file): TWEAK + OTHER. The
    # TWEAK verdict can only be right if doc 1's signature survived in the
    # state store between micro-batches.
    _docs(spark, [(1, BASE)]).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(in_dir)
    q = (
        neardup_stream(stream, max_hamming=12)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        _docs(spark, [(2, TWEAK), (3, OTHER)]).write.mode("append").parquet(in_dir)
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out_dir).count()
            except Exception:
                n = 0
            if n >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n >= 3
    got = {
        r["doc_id"]: (r["is_near_dup"], r["matched_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[1] == (False, None)
    assert got[2] == (True, 1)          # matched across micro-batches
    assert got[3][0] is False


def test_simhash_expr_matches_batch_operator(spark):
    from wpextract_spark.operators.dedup import simhash, simhash_expr

    df = _docs(spark, [(1, BASE), (2, TWEAK), (3, OTHER), (4, ""), (5, "one")])
    batch = {r["doc_id"]: r["simhash"] for r in
             simhash(df, bits=64).collect()}
    perrow = {r["doc_id"]: r["s"] for r in
              df.select("doc_id", simhash_expr(bits=64).alias("s")).collect()}
    assert perrow == batch


def test_popcount64_matches_python_bitcount():
    import numpy as np

    from wpextract_spark.streaming.neardup_stream import _popcount64

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 2**63, size=200, dtype=np.int64).astype(np.uint64)
    vals[:3] = [0, 2**64 - 1, 2**63]
    got = _popcount64(vals)
    assert [int(g) for g in got] == [bin(int(v)).count("1") for v in vals]


def test_stream_cache_verdicts_equal_batch_pair_operator(spark):
    """The last stream/batch pair without an equivalence assert: the
    streaming cache's verdicts must be DERIVABLE from the batch operator's
    exact pair set. With a single bucket (prefix_bits=0), unlimited cache,
    and max_hamming <= bands-1 (lossless pigeonhole banding, caps off),
    the sequential replay of simhash_near_dup_pairs' pairs — first novel
    doc wins, flagged docs never enter the cache — must reproduce every
    stream flag AND matched_id. (Stream == neardup_batch state parity is
    pinned by test_stream_matches_batch_and_state_crosses_microbatches.)"""
    from wpextract_spark.operators.dedup import simhash_near_dup_pairs

    topics = [BASE, OTHER,
              "alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",
              "download the quarterly compliance checklist template from "
              "the portal and submit the signed copy before friday noon"]
    rows = []
    doc_id = 0
    words = ["green", "quick", "lazy", "alpha", "sigma", "portal", "signed"]
    for t_i, topic in enumerate(topics):
        rows.append((doc_id, topic)); doc_id += 1
        for v in range(3):  # clusters of near variants (transitivity matters)
            tweak = topic
            for w in words[: v + 1]:
                tweak = tweak.replace(w, w + "x")
            rows.append((doc_id, tweak)); doc_id += 1
    docs = _docs(spark, rows)

    h = 7  # <= bands-1: banding provably proposes every qualifying pair
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_pairs(
            docs, max_hamming=h, max_bucket=None
        ).collect()
    }
    # Sequential replay of the batch pair set under the cache's rules.
    expected = {}
    novel: list[int] = []
    for i in sorted(r[0] for r in rows):
        match = next(
            (j for j in novel if (min(i, j), max(i, j)) in pairs), None
        )
        expected[i] = (match is not None, match)
        if match is None:
            novel.append(i)
    assert any(f for f, _ in expected.values()), "corpus produced no dups"

    got = {
        r["doc_id"]: (r["is_near_dup"], r["matched_id"])
        for r in neardup_batch(
            docs, max_hamming=h, prefix_bits=0, max_cached=1_000_000
        ).collect()
    }
    assert got == expected

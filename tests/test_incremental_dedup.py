"""Incremental (bloom-prefiltered) dedup: exactness regardless of bloom
false positives, equivalence with the plain anti-join, and bloom math."""

from wpextract_spark.operators.dedup import (
    _bloom_params,
    build_text_bloom,
    incremental_dedup,
)

from pyspark.sql import functions as F


def _corpus(spark, n=60):
    # ids 0..n-1; every 4th text repeats an earlier one -> exact dups exist
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "concat('text body number ', CAST(id % 45 AS STRING)) AS text",
    )


def test_bloom_params_sane():
    m, k = _bloom_params(1000, 0.01)
    assert m % 8 == 0 and 9 * 1000 < m < 11 * 1000
    assert 5 <= k <= 9
    assert _bloom_params(0, 0.01)[0] >= 8  # degenerate input doesn't crash


def test_bloom_no_false_negatives(spark):
    hashes = spark.range(500).select(
        F.md5(F.col("id").cast("string")).alias("text_hash")
    )
    bitmap, m, k = build_text_bloom(hashes, expected_items=500, fpp=0.01)
    import numpy as np

    from wpextract_spark.operators.dedup import _bloom_positions

    bits = np.frombuffer(bitmap, dtype=np.uint8)
    import hashlib

    member = [hashlib.md5(str(i).encode()).hexdigest() for i in range(500)]
    for pos_arr in zip(*[p for p in _bloom_positions(member, m, k)]):
        assert all(bits[int(p) >> 3] >> (int(p) & 7) & 1 for p in pos_arr)


def test_null_text_rows_survive_both_sides(spark):
    # A NULL text yields a NULL md5: the bloom fold must skip it and the
    # probe must treat it as a miss (ADVICE r2) — one bad row may not kill
    # the job, and NULL-key rows are kept (anti-join never equi-matches NULL).
    new = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "beta")], "doc_id long, text string"
    )
    seen = spark.createDataFrame([("alpha",), (None,)], "text string")
    for prefilter in (True, False):
        got = sorted(
            r["doc_id"]
            for r in incremental_dedup(
                new, seen, expected_seen=10, prefilter=prefilter
            ).collect()
        )
        assert got == [2, 3], (prefilter, got)


def test_exact_output_matches_anti_join(spark):
    new = _corpus(spark)
    seen = new.where("doc_id % 3 = 0").select("text")
    with_bloom = incremental_dedup(new, seen, expected_seen=20, fpp=0.2)
    without = incremental_dedup(new, seen, prefilter=False)
    a = sorted(r["doc_id"] for r in with_bloom.collect())
    b = sorted(r["doc_id"] for r in without.collect())
    assert a == b
    # sanity: something was actually removed and something survived
    assert 0 < len(a) < new.count()


def test_tiny_fpp_equals_huge_fpp(spark):
    # fpp only tunes pruning; output must be identical at any setting
    new = _corpus(spark, 40)
    seen = new.where("doc_id < 10").select("text")
    loose = incremental_dedup(new, seen, expected_seen=4, fpp=0.5)
    tight = incremental_dedup(new, seen, expected_seen=1000, fpp=0.001)
    assert sorted(map(tuple, loose.collect())) == sorted(
        map(tuple, tight.collect())
    )


def test_preserves_all_input_columns(spark):
    new = _corpus(spark, 10).withColumn("extra", F.lit("x"))
    seen = spark.createDataFrame([("text body number 1",)], ["text"])
    out = incremental_dedup(new, seen, expected_seen=1)
    assert set(out.columns) == {"doc_id", "text", "extra"}

"""HLL cardinality sketches: estimates within tolerance of exact counts;
per-partition sketches union to the same estimate as one global sketch."""

from pyspark.sql import functions as F

from wpextract_spark.operators.sketches import (
    cardinality_by_group,
    cardinality_rollup,
)

RTOL = 0.05  # lg_k=12 -> ~1.6% rse; 5% is ~3 sigma


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_group_estimates_near_exact(spark):
    docs = _docs(spark).select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.countDistinct("tok").alias("n")).collect()
    }
    approx = {
        r["lang"]: r["approx_distinct"]
        for r in cardinality_by_group(docs, "lang", "tok").collect()
    }
    assert set(approx) == set(exact)
    for lang, n in exact.items():
        assert abs(approx[lang] - n) <= max(1, RTOL * n), (lang, approx[lang], n)


def test_rollup_matches_single_sketch(spark):
    docs = _docs(spark).select(
        "doc_id", "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    # global sketch in one pass
    one = (
        docs.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("tok", F.lit(12)))
            .cast("long")
            .alias("n")
        ).collect()[0]["n"]
    )
    # per-language sketches unioned: identical estimate (mergeability is
    # exact, not approximate — same registers either way)
    rolled = cardinality_rollup(docs, "lang", "tok").collect()[0]
    assert rolled["approx_distinct"] == one
    exact = docs.agg(F.countDistinct("tok").alias("n")).collect()[0]["n"]
    assert abs(one - exact) <= max(1, RTOL * exact)

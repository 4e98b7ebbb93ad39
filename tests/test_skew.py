"""Salting must change only physical distribution, never results."""

from pyspark.sql import functions as F

from wpextract_spark.operators.skew import domain_stats, salted_agg, salted_join, with_salt
from wpextract_spark.sources.synth import generate_pages


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_join(spark):
    left = spark.range(500).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(21).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("rv")
    )
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], "inner", buckets=4)
    assert _rows(plain, "k", "lv", "rv") == _rows(salted, "k", "lv", "rv")


def test_salted_join_left_outer(spark):
    left = spark.range(100).select((F.col("id") % 10).alias("k"), F.col("id").alias("lv"))
    right = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("rv"))
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], "left", buckets=4)
    assert _rows(plain, "k", "lv", "rv") == _rows(salted, "k", "lv", "rv")


def test_salted_agg_matches_plain(spark):
    df = spark.range(1000).select(
        (F.col("id") % 13).alias("k"), (F.col("id") * 3 % 17).alias("v")
    )
    plain = df.groupBy("k").agg(
        F.count("v").alias("count_v"), F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"), F.max("v").alias("max_v"),
    )
    salted = salted_agg(df, ["k"], {"v": "count"}, buckets=8).join(
        salted_agg(df, ["k"], {"v": "sum"}, buckets=8), "k"
    )
    p = {r["k"]: (r["count_v"], r["sum_v"]) for r in plain.collect()}
    s = {r["k"]: (r["count_v"], r["sum_v"]) for r in salted.collect()}
    assert p == s


def test_salt_deterministic(spark):
    df = spark.range(200).select(F.col("id"), (F.col("id") % 5).alias("k"))
    a = {r["id"]: r["_salt"] for r in with_salt(df, 8).collect()}
    b = {r["id"]: r["_salt"] for r in with_salt(df.repartition(7), 8).collect()}
    assert a == b  # content-derived: survives repartition/retry


def test_domain_stats_on_skewed_pages(spark):
    pages = generate_pages(spark, n_pages=300, seed=5)
    stats = domain_stats(pages, buckets=4)
    plain = pages.groupBy(F.parse_url("url", F.lit("HOST")).alias("domain")).agg(
        F.count("*").alias("n_docs"), F.sum(F.octet_length("html")).alias("total_bytes")
    )
    s = {r["domain"]: (r["n_docs"], r["total_bytes"]) for r in stats.collect()}
    p = {r["domain"]: (r["n_docs"], r["total_bytes"]) for r in plain.collect()}
    assert s == p
    assert sum(v[0] for v in s.values()) == 300

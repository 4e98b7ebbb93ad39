"""Explicit skew handling: key salting for joins and aggregations.

North-rule requirement: "salting on domain keys handles skew from mega-sites"
(BASELINE.json north_star). AQE's skew-join splitting covers sort-merge joins
at runtime; these operators are the *explicit* form for plans where the skew
is known ahead of time (domain keys over a web corpus follow a Zipf law: one
mega-site can be 10% of all rows) or where AQE cannot help (hash aggregations
with hot keys, non-SMJ joins).

All outputs are row-identical to their unsalted equivalents — the salt only
changes the physical distribution — which is what the DuckDB oracles check.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets): hash of the whole row.

    Content-derived (``xxhash64`` over all columns) rather than random, so
    re-runs and retried tasks salt identically — required for exactly-once
    sinks and for stable lineage.
    """
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join where ``left`` is large and skewed on ``on`` and ``right``
    is too big to broadcast but small enough to replicate ``buckets`` times.

    The hot key's rows spread over ``buckets`` reducers instead of one: left
    rows get a content-derived salt, right rows are exploded across every
    salt value, and the join keys on (key, salt). Output rows are identical
    to ``left.join(right, on, how)`` for the supported ``how`` values.

    Only left-preserving joins are supported: the right side is replicated
    ``buckets`` times, so right/full(/right-anti) joins would emit every
    unmatched right row once per salt bucket. Use the mirrored call (swap
    sides, salt the other table) for those.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r} "
            "(right rows are replicated per salt bucket)"
        )
    salted_left = with_salt(left, buckets)
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = salted_left.join(salted_right, [*on, "_salt"], how)
    return joined.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: group by (key, salt)
    first, then merge partials by key.

    ``aggs`` maps column -> agg in {count, sum, min, max} (the algebraic
    aggregates whose partials merge losslessly: counts re-sum, sums re-sum,
    min/max re-min/max). Result columns are named ``<agg>_<col>``.

    Spark's hash aggregate already does map-side partials; the explicit salt
    additionally splits the *reduce side* of a hot key across ``buckets``
    tasks — the case where one domain holds 10^9 rows and a single reducer
    would spill alone.
    """
    merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    first = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    for agg in aggs.values():
        if agg not in merge:
            raise ValueError(f"non-algebraic aggregate {agg!r}")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[first[agg](col).alias(f"{agg}_{col}") for col, agg in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge[agg](f"{agg}_{col}").alias(f"{agg}_{col}") for col, agg in aggs.items()]
    )


def domain_of(url: Column) -> Column:
    """Registrable host of a url column (the canonical skew key for a web
    corpus)."""
    return F.parse_url(url, F.lit("HOST"))


def domain_stats(
    pages: DataFrame, url_col: str = "url", buckets: int = DEFAULT_SALT
) -> DataFrame:
    """Per-domain doc/byte rollup with salted two-stage aggregation:
    (domain, n_docs, total_bytes). The mega-site guard for corpus metrics."""
    sized = pages.select(
        domain_of(F.col(url_col)).alias("domain"),
        F.octet_length("html").alias("bytes"),
    )
    out = salted_agg(sized, ["domain"], {"domain": "count", "bytes": "sum"}, buckets)
    return out.select(
        "domain",
        F.col("count_domain").alias("n_docs"),
        F.col("sum_bytes").alias("total_bytes"),
    )

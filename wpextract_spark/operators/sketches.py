"""Mergeable cardinality sketches: the 100-TB path for distinct counts.

``countDistinct`` is exact but needs every distinct value to survive a
shuffle; at corpus scale (distinct URLs, users, tokens per group) the right
tool is a bounded-size mergeable sketch. Spark ships Apache DataSketches
HyperLogLog natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``): each task builds a fixed-size sketch map-side,
the shuffle moves sketches (KBs) instead of values, and sketches built over
PARTITIONS of the data union into exactly the sketch of the whole — the
property that makes incremental/rollup pipelines work (daily sketches union
into monthly; per-source sketches union into global).

Estimates are approximate, so these operators are pytest-verified against
exact counts with an error tolerance rather than driver-oracle-hashed
(DuckDB's approx_count_distinct is a different HLL implementation — its
estimates do not match bit-for-bit, and neither engine guarantees a stable
value across versions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2 of the sketch's register count; 12 -> 4096 registers, ~1.6% rse.
DEFAULT_LG_K = 12


def cardinality_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Approximate distinct ``value_col`` per ``group_col``:
    ``(group, approx_distinct)``. One shuffle moving fixed-size sketches."""
    return (
        df.groupBy(group_col)
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk"))
        .select(
            group_col,
            F.hll_sketch_estimate("sk").cast("long").alias("approx_distinct"),
        )
    )


def cardinality_rollup(
    df: DataFrame,
    part_col: str,
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Two-level rollup proving mergeability: build one sketch per
    ``part_col`` partition, then UNION the sketches into a single global
    estimate — without ever revisiting the rows. Returns one row:
    ``(n_parts, approx_distinct)``.

    This is the incremental shape: persist the per-part sketches (binary
    column) and each new ingest unions its sketch in; the global distinct
    count never rescans history.
    """
    per_part = df.groupBy(part_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk")
    )
    return per_part.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("approx_distinct"),
    )

"""Recrawl scheduling: per-URL change-rate estimation from crawl history.

A continuous crawl re-fetches pages at different cadences: news front pages
change hourly, archived posts never.  The standard estimator (Cho &
Garcia-Molina's refresh-policy line of work) observes each URL's content
fingerprint across past runs and derives a change rate that drives the
next-crawl priority.  This operator turns a crawl-history table
``(url, run_id, fp)`` — one row per URL per run, fingerprints from
:func:`wpextract_spark.operators.snapshot.snapshot_diff`'s ``md5``/simhash
column — into per-URL schedule features.

Scale shape: one shuffle on ``url`` feeding a window whose partitions are a
single URL's history (bounded by the number of retained runs, typically
tens) — uniform keys, no skew, no driver traffic.  At 10^12 URLs this is a
plain url-hash-partitioned pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rates(
    history: DataFrame,
    id_col: str = "url",
    run_col: str = "run_id",
    fp_col: str = "fp",
) -> DataFrame:
    """(url, n_runs, n_changes, change_rate, last_changed, tier).

    ``n_changes`` counts runs whose fingerprint differs from the previous
    observation of the same URL; ``change_rate = n_changes / (n_runs - 1)``
    (null for single-observation URLs — no evidence yet).
    ``last_changed`` is whether the most recent run changed.  ``tier`` is
    the schedule bucket: ``hot`` (rate ≥ 0.5), ``warm`` (≥ 0.1), ``cool``
    (> 0), ``static`` (0), ``new`` (single observation).
    """
    w = Window.partitionBy(id_col).orderBy(run_col)
    prev = F.lag(F.col(fp_col)).over(w)
    obs = history.select(
        F.col(id_col).alias("url"),
        F.col(run_col).alias("run"),
        # int flags: 1 = changed vs previous run, 0 = same, null = first obs
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .when(F.col(fp_col) != prev, F.lit(1))
        .otherwise(F.lit(0))
        .alias("changed"),
    )
    # Guarded: ANSI mode makes a bare n_changes/0 throw for single-obs URLs.
    rate = F.when(
        F.col("n_runs") > 1, F.col("n_changes") / (F.col("n_runs") - F.lit(1))
    )
    return (
        obs.groupBy("url")
        .agg(
            F.count("*").alias("n_runs"),
            F.coalesce(F.sum("changed"), F.lit(0)).alias("n_changes"),
            (F.max_by(F.col("changed"), F.col("run")) == 1).alias("last_changed"),
        )
        .select(
            "url",
            "n_runs",
            "n_changes",
            F.round(rate, 6).alias("change_rate"),
            F.when(F.col("n_runs") > 1, F.col("last_changed")).alias(
                "last_changed"
            ),
            F.when(F.col("n_runs") <= 1, F.lit("new"))
            .when(rate >= 0.5, F.lit("hot"))
            .when(rate >= 0.1, F.lit("warm"))
            .when(rate > 0, F.lit("cool"))
            .otherwise(F.lit("static"))
            .alias("tier"),
        )
    )

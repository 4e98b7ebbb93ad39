"""Site-template boilerplate removal: strip lines repeated across a host.

WordPress-style sites render the same navigation, sidebar, share-widget and
footer text on EVERY page of the host; a boilerplate line is therefore one
whose document frequency WITHIN ITS HOST crosses a threshold.  This is the
site-scoped complement of corpus-global line dedup
(:func:`wpextract_spark.operators.corpusfilters.line_dedup`): "all rights
reserved" is corpus-global, "Acme Blog — Home | About | Contact" only
repeats inside acme.example and would never cross a corpus-wide count on a
big crawl, yet is pure template noise.

Plan shape at 10^12 pages: explode lines → per-(host, line) document
frequency (distinct-page first, so a line repeated inside one page counts
once) → compare against per-host page counts → anti-join the blacklist
back onto the exploded lines → reassemble per page.  Every aggregation and
join keys on (host, normalized-line); mega-host skew dilutes across the
host's distinct line strings exactly like the anchor-text aggregation, and
partial aggregation collapses each partition's template repeats before any
shuffle.  No windows, no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strip_site_boilerplate(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.6,
    min_pages: int = 2,
) -> DataFrame:
    """(id, text_clean, n_lines, n_kept) with host-template lines removed.

    A line is boilerplate when it appears (normalized: lowercased, trimmed)
    on at least ``min_frac`` of its host's pages, provided the host has at
    least ``min_pages`` pages (below that there is no template evidence and
    nothing is stripped).  Blank lines are never counted as boilerplate —
    they are structure, not template.
    """
    host = F.col(host_col)
    lines = pages.select(
        host.alias("host"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    ).withColumn("norm", F.lower(F.trim(F.col("line"))))

    host_pages = pages.groupBy(host.alias("host")).agg(
        F.count("*").alias("n_pages")
    )
    line_df = (
        lines.where(F.col("norm") != "")
        .select("host", "norm", "_id")
        .distinct()
        .groupBy("host", "norm")
        .agg(F.count("*").alias("df"))
    )
    blacklist = (
        line_df.join(host_pages, "host")
        .where(
            (F.col("n_pages") >= F.lit(min_pages))
            & (F.col("df") >= F.col("n_pages") * F.lit(min_frac))
        )
        .select("host", "norm")
    )
    kept = lines.join(blacklist, ["host", "norm"], "left_anti")
    reassembled = kept.groupBy("_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    # bigint throughout: engine-portable counter types (size() is int32).
    n_lines = F.size(F.split(F.col(text_col), "\n", -1)).cast("bigint")
    return (
        pages.select(F.col(id_col).alias("_id"), n_lines.alias("n_lines"))
        .join(reassembled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )

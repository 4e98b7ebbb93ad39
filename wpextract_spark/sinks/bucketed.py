"""Bucketed-table writer: pre-shuffled storage for co-located joins.

The registry/resolution joins in this engine broadcast the small side; the
joins that CAN'T broadcast — pages×pages self-joins, repeated
corpus-to-corpus joins on ``url`` across pipeline runs — pay a full shuffle
of both sides every time. Bucketing moves that shuffle to *write time*, once:
a table written with ``bucketBy(n, key)`` stores rows hash-clustered by key,
and a join between two tables bucketed the same way executes with **zero
Exchange operators** — each task reads bucket i of both sides.

This is the on-disk analog of ``repartition``: pay one shuffle when the
table is produced, amortize it over every subsequent join/aggregation on the
key. At 10^12 documents the url-keyed joins are the dominant shuffle; a
bucketed pages table eliminates them for the whole downstream DAG.

Rules the writer enforces (silent violations degrade to shuffles later):
* same bucket count on both sides of an intended join;
* ``sortBy`` within buckets so the merge join needs no per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 256,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table in the session
    catalog. ``n_buckets`` bounds join parallelism for every future
    co-located join on ``bucket_col`` — size it like a shuffle-partition
    count at the target scale, not at test scale."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)

"""Training-shard writer: packed sequences -> numbered parquet shards.

The consumer of a packing pipeline is a training job that wants a flat
directory of similar-sized shard files it can assign to data-loader workers.
This sink maps contiguous ``seq_id`` ranges to shards (so shard k holds
sequences [k*per_shard, (k+1)*per_shard) — curriculum order is preserved and
a shard's contents are reproducible from its number alone) and writes one
parquet file per shard via ``partitionBy``.

Scale notes: ``repartition(shard)`` is one hash shuffle sized by the shard
count; each writer task then owns exactly one shard directory, so the commit
is one file per shard with no small-file explosion. Shard count = total
sequences / per_shard; pick ``seqs_per_shard`` so a shard is a few hundred
MB (the parquet sweet spot) at the target corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    sequences: DataFrame,
    path: str,
    seqs_per_shard: int = 1024,
    seq_col: str = "seq_id",
) -> None:
    """Write packed sequences as ``shard=K`` parquet partitions."""
    if seqs_per_shard < 1:
        raise ValueError("seqs_per_shard must be >= 1")
    sharded = sequences.withColumn(
        "shard", F.floor(F.col(seq_col) / seqs_per_shard).cast("long")
    )
    (
        sharded.repartition("shard")
        .sortWithinPartitions(seq_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )

"""PageRank over the internal-link graph.

The wpextract data model resolves internal links into a doc->doc edge list
(reference: link resolution in ``extract/links.py``); ranking that graph is
the canonical downstream use (crawl prioritisation, quality priors for
curation). This is the one genuinely *iterative* operator in the engine, so
it is written the way iterative algorithms should be on Spark:

* each iteration is one join + one aggregation — the only corpus-sized
  shuffle is keyed by ``dst``, and the edge list keeps its partitioning
  across iterations so AQE reuses the exchange;
* the dangling-node mass (rank parked on nodes with no out-edges) is folded
  back via a one-row aggregate cross-joined onto the update — a pure plan
  construct, so NO driver action happens inside the loop (the driver only
  builds the DAG; a single count() up front fixes N);
* lineage is cut with ``localCheckpoint`` every few iterations — without it
  the plan doubles per iteration and the optimizer chokes long before the
  executors do (the classic iterative-Spark failure mode).

Convergence is fixed-iteration (``n_iter``), matching the unrolled SQL
oracle exactly; production would add a delta-based stop on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Cut lineage this often; 5 keeps plan depth bounded while amortising the
#: checkpoint materialisation over several shuffle-reusing iterations.
_CHECKPOINT_EVERY = 5


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank. Input: an edge list (parallel edges are
    collapsed). Output: ``(node, rank)`` for every node that appears as a
    source or destination; ranks sum to 1.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # Pin the two loop-invariant sides so every iteration rejoins the same
    # materialised partitions instead of re-deriving them from the scan.
    if checkpoint:
        e = e.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
        out_deg = out_deg.localCheckpoint(eager=False)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iter):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(F.col("dst"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # Dangling mass as a 1-row aggregate cross-joined in: keeps the loop
        # action-free on the driver.
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("dangling") / n
                    )
                ).alias("rank"),
            )
        )
        if checkpoint and (it + 1) % _CHECKPOINT_EVERY == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks

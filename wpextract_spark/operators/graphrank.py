"""PageRank over the internal-link graph.

The wpextract data model resolves internal links into a doc->doc edge list
(reference: link resolution in ``extract/links.py``); ranking that graph is
the canonical downstream use (crawl prioritisation, quality priors for
curation). This is the one genuinely *iterative* operator in the engine, so
it is written the way iterative algorithms should be on Spark:

* each iteration is one join + one aggregation, with NO corpus-sized
  shuffle inside the loop: the weighted edge list (edges pre-joined with
  out-degrees) is hash-partitioned by ``src`` ONCE before the loop and
  persisted — persist, not checkpoint, because an InMemoryRelation keeps
  its partitioning visible to EnsureRequirements while (under AQE) a
  checkpoint's LogicalRDD does not — and ``nodes`` likewise by ``node``;
  only node-sized tables (ranks in, partial-aggregated contributions out)
  cross the wire each round;
* the dangling-node mass (rank parked on nodes with no out-edges) is folded
  back via a one-row aggregate cross-joined onto the update — ``nodes``
  carries a loop-invariant ``is_dangling`` flag, so the per-iteration
  dangling sum is a filter + scalar aggregate (a single-row exchange), not
  an anti-join. A pure plan construct: NO driver action happens inside the
  loop (the driver only builds the DAG; a single count() up front fixes N);
* the rank table is lazy-checkpointed EVERY iteration: two consumers read
  it each round (the contribution join and the dangling aggregate), so a
  shared materialised RDD is what keeps the evaluation tree from doubling
  per iteration — and it bounds lineage depth, the classic
  iterative-Spark failure mode.

Convergence is fixed-iteration (``n_iter``), matching the unrolled SQL
oracle exactly; production would add a delta-based stop on top.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F



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
    # Loop-invariant sides, built once:
    #  * weighted edges (src, dst, out_deg), hash-partitioned by src — the
    #    per-iteration out_deg join disappears from the loop entirely;
    #  * nodes with a precomputed is_dangling flag, partitioned by node —
    #    the per-iteration dangling ANTI-join becomes a cheap filter.
    # Both use the same shuffle-partition count, and the rank table below
    # stays hash-partitioned by node across iterations, so the two joins in
    # the loop are co-partitioned: the only corpus-sized exchange per
    # iteration is the groupBy(dst).
    weighted = e.join(out_deg, "src").repartition("src")
    nodes = (
        nodes.join(
            out_deg.select(F.col("src").alias("node"), F.lit(True).alias("_out")),
            "node",
            "left",
        )
        .select("node", F.col("_out").isNull().alias("is_dangling"))
        .repartition("node")
    )
    # Pin the loop-invariant sides with persist(), NOT localCheckpoint: under
    # AQE a checkpoint's LogicalRDD reports unknown partitioning, so every
    # iteration would re-exchange the (corpus-sized) edge table; an
    # InMemoryRelation keeps hashpartitioning(src)/(node) visible to
    # EnsureRequirements, so the loop's joins are exchange-free on these
    # sides, round after round.
    if checkpoint:
        weighted = weighted.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iter):
        contribs = (
            weighted.join(ranks, weighted["src"] == ranks["node"])
            .select(F.col("dst"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # Dangling mass as a 1-row aggregate cross-joined in: keeps the loop
        # action-free on the driver. The flag makes it a filter + scalar agg
        # (single-row exchange) instead of a corpus-sized anti-join.
        dangling = ranks.where("is_dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_dangling",
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
        # Lazy-checkpoint EVERY iteration: ranks is consumed twice next round
        # (contribution join + dangling aggregate) — sharing one materialised
        # RDD between the two consumers is what stops the evaluation tree
        # from doubling per iteration (2^k recompute between sparser cuts),
        # and it also bounds lineage depth. The node-sized re-exchange this
        # costs (checkpoint partitioning is opaque to AQE) is |V| rows, not
        # |E| — the right trade at crawl-graph scale.
        if checkpoint and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    if checkpoint:
        # The loop-invariant caches (the corpus-sized weighted-edge table!)
        # must outlive this call — the returned plan still reads them — but
        # must not accumulate across repeated pagerank() calls in a
        # long-lived session. Register for deterministic release:
        # ``cache.release("pagerank")`` after consuming the ranks.
        from wpextract_spark.operators.cache import track

        track(weighted, scope="pagerank")
        track(nodes, scope="pagerank")
    return ranks.select("node", "rank")

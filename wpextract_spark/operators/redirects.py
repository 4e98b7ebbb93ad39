"""Redirect-chain resolution by pointer doubling.

A crawl records 3xx hops as a ``(src, dst)`` edge table; every kept page's
canonical identity is the TERMINAL of its redirect chain (the URL the
crawler actually fetched content from).  Resolving chains is what lets URL
dedup, link resolution, and snapshot diffing key on the page a redirect
*lands on* rather than the alias it was discovered under.

Naive resolution walks one hop per join — O(L) shuffles for chain length L.
This operator squares the mapping each round (``f ← f∘f``), so chains of
length ≤ 2^k resolve in k self-joins: a 64-hop chain costs 6 shuffles, and
the per-round working set never grows (always one row per source URL).
That is the property that matters at 10^12 rows — rounds are O(log L), each
round a single hash-partition-aligned self-join, no corpus-sized driver
traffic (the convergence probe is a 1-row count action, same idiom as
``operators/clustering.py``).

Cycles (A→B→…→A) never reach a terminal.  They are reported, not resolved:
after the round bound, any row whose current target is still a redirect
source gets ``resolved = false`` and null ``final_url`` / ``hops`` — the
retention pipeline drops or quarantines those URLs (a crawler would have
aborted the fetch at its own hop cap).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_chain: int = 64,
) -> DataFrame:
    """One row per redirect source: (src, final_url, hops, resolved).

    ``final_url`` is the chain's terminal (a URL that is not itself a
    redirect source) and ``hops`` the exact chain length; both are null for
    chains still unterminated after ``max_chain`` hops — i.e. cycles, or
    chains longer than the cap (crawlers cap redirects far lower; 64 is
    generous).

    The edge table is keyed by ``src``: a source URL redirects to exactly
    one place.  Real crawl logs can violate that (the same URL recorded
    across runs, or a flapping server), and a duplicated ``src`` would make
    every doubling join fan out multiplicatively — so the input is deduped
    defensively to one edge per source with a deterministic tie-break
    (smallest ``dst``) before the loop.  Feed per-run snapshots, not
    mixed-run unions, when the winner matters.
    """
    rounds = max(1, math.ceil(math.log2(max_chain)))
    mapping = (
        redirects.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
        .select("src", "dst", F.lit(1).cast("int").alias("hops"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        hop = mapping.select(
            F.col("src").alias("h_src"),
            F.col("dst").alias("h_dst"),
            F.col("hops").alias("h_hops"),
        )
        advanced_flag = F.col("h_dst").isNotNull().cast("int")
        step = (
            mapping.join(hop, mapping["dst"] == hop["h_src"], "left")
            .select(
                "src",
                F.coalesce("h_dst", "dst").alias("dst"),
                (F.col("hops") + F.coalesce("h_hops", F.lit(0))).alias("hops"),
                advanced_flag.alias("_adv"),
            )
            .localCheckpoint(eager=False)
        )
        # ONE action per round: materializes the lazy checkpoint AND reads
        # the convergence signal off the doubling join itself (no separate
        # probe join/job).  advanced == 0 means every row already pointed
        # at a terminal; cyclic rows advance every round, so the round
        # bound is what stops them.
        advanced = step.agg(F.sum("_adv")).first()[0]
        mapping = step.drop("_adv")
        if not advanced:
            break
    # Terminal = not a redirect source.  One anti-ish left join at the end;
    # the source-key set is loop-invariant but only read here.
    sources = redirects.select(F.col(src).alias("k")).distinct()
    resolved = F.col("k").isNull()
    return (
        mapping.join(sources, mapping["dst"] == sources["k"], "left")
        .select(
            "src",
            F.when(resolved, F.col("dst")).alias("final_url"),
            F.when(resolved, F.col("hops")).alias("hops"),
            resolved.alias("resolved"),
        )
    )

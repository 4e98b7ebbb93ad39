"""PageRank: probability conservation, analytic small-graph values,
dangling-node mass, and checkpoint equivalence."""

import math

from wpextract_spark.operators.graphrank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_ranks_sum_to_one(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)])
    total = sum(_ranks(pagerank(e, n_iter=5)).values())
    assert math.isclose(total, 1.0, abs_tol=1e-9)


def test_two_node_cycle_is_uniform(spark):
    # symmetric graph -> uniform stationary distribution at any iteration
    r = _ranks(pagerank(_edges(spark, [(1, 2), (2, 1)]), n_iter=4))
    assert math.isclose(r[1], 0.5, abs_tol=1e-12)
    assert math.isclose(r[2], 0.5, abs_tol=1e-12)


def test_sink_with_dangling_redistribution(spark):
    # 1->3, 2->3: node 3 is dangling; its mass must come back uniformly,
    # keeping the total at 1 and rank(3) strictly highest.
    r = _ranks(pagerank(_edges(spark, [(1, 3), (2, 3)]), n_iter=8))
    assert math.isclose(sum(r.values()), 1.0, abs_tol=1e-9)
    assert r[3] > r[1] and math.isclose(r[1], r[2], abs_tol=1e-12)


def test_hub_outranks_leaves(spark):
    # 2..5 are pure leaves; 0 (hub) and 1 (its sole out-neighbour) trade
    # mass each iteration, so only hub-vs-leaf is parity-stable.
    star = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    r = _ranks(pagerank(_edges(spark, star), n_iter=10))
    assert all(r[0] > r[leaf] for leaf in range(2, 6))
    assert all(r[1] > r[leaf] for leaf in range(2, 6))


def test_checkpoint_off_matches_on(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (4, 2), (2, 4)])
    on = _ranks(pagerank(e, n_iter=6, checkpoint=True))
    off = _ranks(pagerank(e, n_iter=6, checkpoint=False))
    assert on.keys() == off.keys()
    for k in on:
        assert math.isclose(on[k], off[k], abs_tol=1e-12)


def test_parallel_edges_collapse(spark):
    once = _ranks(pagerank(_edges(spark, [(1, 2), (2, 1)]), n_iter=3))
    dup = _ranks(pagerank(_edges(spark, [(1, 2), (1, 2), (2, 1)]), n_iter=3))
    assert once == dup


def test_empty_graph(spark):
    out = pagerank(
        spark.createDataFrame([], "src bigint, dst bigint"), n_iter=2
    )
    assert out.count() == 0


def test_loop_edges_never_reshuffle(spark):
    """The 100-TB contract of the iterative loop: the persisted weighted edge
    table (the corpus-sized side) must enter every iteration's join straight
    from its InMemoryTableScan — no Exchange above it — and the nodes side
    likewise. Only node-sized tables (ranks, partial-aggregated contribs,
    the 1-row dangling mass) may cross the wire. Broadcast is disabled so
    small-scale AQE can't mask a missing co-partition."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = (
            spark.range(5000)
            .select(
                (F.col("id") % 300).alias("src"),
                ((F.col("id") * 13) % 280).alias("dst"),
            )
            .where("src != dst")
        )
        plan = (
            pagerank(edges, n_iter=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # Outer plan only: cached-relation interiors and AQE "Initial Plan"
    # dumps repeat pre-loop exchanges that run once, not per iteration.
    outer, skip_indent = [], None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*("))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line or "== Initial Plan ==" in line:
            skip_indent = indent
            continue
        outer.append(line)
    exchanges = [l for l in outer if "Exchange" in l and "Broadcast" not in l
                 and "Reused" not in l]
    # Per final iteration: groupBy(dst) partial-agg exchange, the node-sized
    # ranks re-exchange (checkpoint partitioning is opaque), and the 1-row
    # dangling SinglePartition — and nothing else.
    assert len(exchanges) == 3, exchanges
    hash_keys = [l for l in exchanges if "hashpartitioning" in l]
    assert all(("dst#" in l) or ("node#" in l) for l in hash_keys), hash_keys
    # The weighted-edge cache feeds its join with no exchange in between.
    for i, line in enumerate(outer):
        if "InMemoryTableScan [src#" in line:
            above = outer[max(0, i - 3):i]
            assert not any("Exchange" in a for a in above), above

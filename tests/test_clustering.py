"""Connected-components clustering: labels must equal the true transitive
closure (checked against a pure-Python union-find on the same edges)."""

import random

from pyspark.sql import functions as F

from wpextract_spark.operators.clustering import (
    connected_components,
    near_dup_keep_list,
)


def _uf_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min of component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return sorted((n, root) for root, ns in comp.items() for n in ns)


def _cc_rows(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return sorted(tuple(r) for r in connected_components(df).collect())


def test_two_components_and_singleton_edge(spark):
    edges = [(1, 2), (2, 3), (10, 11), (5, 5)]  # self-loop dropped
    assert _cc_rows(spark, edges) == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_long_chain_converges(spark):
    # A 40-node path is the worst case for naive min-propagation (diameter
    # rounds); large-star/small-star must still land the single min label.
    edges = [(i, i + 1) for i in range(40)]
    rows = _cc_rows(spark, edges)
    assert rows == [(i, 0) for i in range(41)]


def test_duplicate_and_reversed_edges_are_normalized(spark):
    edges = [(2, 1), (1, 2), (2, 1), (3, 2)]
    assert _cc_rows(spark, edges) == [(1, 1), (2, 1), (3, 1)]


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    expected = _uf_labels([(a, b) for a, b in edges if a != b])
    assert _cc_rows(spark, edges) == expected


def test_keep_list_marks_cluster_minima(spark):
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(1, 4), (4, 6), (2, 3)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dup_keep_list(docs, pairs).collect()
    }
    assert rows == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (2, False),
        4: (1, False),
        5: (5, True),
        6: (1, False),
        7: (7, True),
    }

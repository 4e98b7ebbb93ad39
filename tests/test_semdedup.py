"""SemDeDup semantic dedup (operators/similarity.py:semantic_dedup)."""

import numpy as np
import pytest

from wpextract_spark.operators.similarity import semantic_dedup


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_identical_vectors_first_wins(spark):
    # ids 0,1 are the centroid seeds (id < n_lists); 2 duplicates 0, 3 is
    # near-orthogonal to everything.
    vecs = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.1, 0.1, 5.0],
    ]
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(_emb(spark, vecs), n_lists=2, n_iter=1, threshold=0.9).collect()
    }
    assert got[0]["is_kept"] and not got[2]["is_kept"]  # dup of 0, 0 ranks first
    assert got[1]["is_kept"] and got[3]["is_kept"]
    assert got[0]["cluster_id"] == got[2]["cluster_id"]


def test_max_cluster_cap_keeps_overflow_unverified(spark):
    # 10 identical vectors in one cluster; cap at 3 -> ranks 4.. are never
    # joined, so only ranks 2..3 can be marked dups.
    vecs = [[1.0, 0.0]] * 10 + [[0.0, 1.0]]
    df = semantic_dedup(_emb(spark, vecs), n_lists=2, n_iter=1, threshold=0.99, max_cluster=3)
    rows = df.collect()
    dropped = sorted(r["vec_id"] for r in rows if not r["is_kept"])
    assert len(dropped) == 2  # exactly ranks 2 and 3 of the big cluster


def test_matches_greedy_reference(spark):
    """Brute-force NumPy restatement of the keep policy on random data."""
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(np.float32)
    threshold, n_lists = 0.25, 4
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_kept"])
        for r in semantic_dedup(
            _emb(spark, vecs), n_lists=n_lists, n_iter=2, threshold=threshold
        ).collect()
    }

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    v = vecs.astype(np.float64)
    # reference kmeans: same deterministic protocol (init = ids < k, cosine
    # assign with smallest-cid tiebreak, 6dp-rounded means)
    cents = [v[i].copy() for i in range(n_lists)]
    for _ in range(2):
        assign = [
            max(range(n_lists), key=lambda c: (cos(v[i], cents[c]), -c))
            for i in range(len(v))
        ]
        for c in range(n_lists):
            members = [i for i in range(len(v)) if assign[i] == c]
            if members:
                cents[c] = np.round(v[members].mean(axis=0), 6)
    assign = [
        max(range(n_lists), key=lambda c: (cos(v[i], cents[c]), -c))
        for i in range(len(v))
    ]
    kept = {}
    for c in range(n_lists):
        members = sorted(
            (i for i in range(len(v)) if assign[i] == c),
            key=lambda i: (-round(cos(v[i], cents[assign[i]]), 6), i),
        )
        for pos, i in enumerate(members):
            kept[i] = not any(
                cos(v[j], v[i]) >= threshold for j in members[:pos]
            )
    assert {i: (assign[i], kept[i]) for i in kept} == got


def test_all_kept_when_threshold_one(spark):
    vecs = np.random.RandomState(3).randn(12, 4)
    rows = semantic_dedup(_emb(spark, vecs), n_lists=2, n_iter=1, threshold=1.01).collect()
    assert all(r["is_kept"] for r in rows) and len(rows) == 12

"""Product-quantization ANN (operators/similarity.py:pq_topk/pq_codebooks)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from wpextract_spark.operators.similarity import (
    cosine_topk,
    hyperplane,
    kmeans_centroids,
    pq_codebooks,
    pq_topk,
)


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_joint_codebooks_match_serial_kmeans(spark):
    """pq_codebooks must be BIT-identical to m serial kmeans_centroids runs
    on the sliced table (same init, assignment, rounded means)."""
    vecs = np.random.RandomState(11).randn(60, 16).astype(np.float32)
    emb = _emb(spark, vecs)
    m, ks, dsub = 4, 8, 4
    joint = pq_codebooks(emb, 16, m=m, ks=ks, n_iter=2)
    for s in range(m):
        sub = emb.select(
            F.col("vec_id"),
            F.slice(F.col("embedding").cast("array<double>"), s * dsub + 1, dsub).alias(
                "embedding"
            ),
        )
        serial = kmeans_centroids(sub, n_lists=ks, n_iter=2)
        assert joint[s] == serial


def test_pq_topk_finds_exact_top1(spark):
    vecs = np.random.RandomState(5).randn(200, 16)
    emb = _emb(spark, vecs)
    query = hyperplane(7, 16)
    exact = cosine_topk(emb, query, k=10).collect()
    approx = pq_topk(emb, query, k=10, m=4, ks=8, n_iter=1, refine_k=60).collect()
    assert approx[0]["vec_id"] == exact[0]["vec_id"]
    # healthy recall through the refine stage
    overlap = {r["vec_id"] for r in approx} & {r["vec_id"] for r in exact}
    assert len(overlap) >= 6
    # exact re-rank: cos_sim values must equal the brute-force scores
    exact_scores = {r["vec_id"]: r["cos_sim"] for r in exact}
    for r in approx:
        if r["vec_id"] in exact_scores:
            assert r["cos_sim"] == exact_scores[r["vec_id"]]


def test_pq_is_deterministic(spark):
    vecs = np.random.RandomState(9).randn(80, 8)
    emb = _emb(spark, vecs)
    q = hyperplane(3, 8)
    a = pq_topk(emb, q, k=5, m=2, ks=4, n_iter=2, refine_k=20).collect()
    b = pq_topk(emb, q, k=5, m=2, ks=4, n_iter=2, refine_k=20).collect()
    assert a == b


def test_dim_must_divide(spark):
    emb = _emb(spark, np.ones((8, 6)))
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(emb, [1.0] * 6, m=4)

def test_ivfpq_routes_then_scans(spark):
    """IVF-PQ: results come only from probed lists, re-rank scores are the
    exact brute-force cosines, and the top-1 survives the composition."""
    from wpextract_spark.operators.similarity import ivf_topk, ivfpq_topk

    vecs = np.random.RandomState(13).randn(240, 16)
    emb = _emb(spark, vecs)
    query = hyperplane(7, 16)
    got = ivfpq_topk(
        emb, query, k=8, n_lists=6, n_probe=3, m=4, ks=8, n_iter=1, refine_k=80
    ).collect()
    assert len(got) == 8
    assert len({r["list_id"] for r in got}) <= 3  # only probed lists
    exact = {r["vec_id"]: r["cos_sim"] for r in cosine_topk(emb, query, k=240).collect()}
    for r in got:
        assert r["cos_sim"] == exact[r["vec_id"]]  # exact re-rank
    # the probe-filtered exact path (ivf with the same trained centroids)
    # bounds what ivfpq can return: its top-1 must match ivf's top-1
    cents = kmeans_centroids(emb, n_lists=6, n_iter=1)
    ivf = ivf_topk(emb, query, k=1, n_probe=3, centroids=cents).collect()
    assert got[0]["vec_id"] == ivf[0]["vec_id"]


def test_ivfpq_deterministic(spark):
    from wpextract_spark.operators.similarity import ivfpq_topk

    vecs = np.random.RandomState(21).randn(90, 8)
    emb = _emb(spark, vecs)
    q = hyperplane(3, 8)
    kw = dict(k=5, n_lists=4, n_probe=2, m=2, ks=4, n_iter=1, refine_k=30)
    assert ivfpq_topk(emb, q, **kw).collect() == ivfpq_topk(emb, q, **kw).collect()


def test_interpreted_eval_restores_conf_on_error(spark):
    from wpextract_spark.operators.similarity import _interpreted_eval

    emb = _emb(spark, np.ones((4, 4)))
    ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    with pytest.raises(RuntimeError, match="boom"):
        with _interpreted_eval(emb):
            assert spark.conf.get("spark.sql.codegen.wholeStage") == "false"
            assert spark.conf.get("spark.sql.codegen.factoryMode") == "NO_CODEGEN"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == ws
    assert spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK") == fm

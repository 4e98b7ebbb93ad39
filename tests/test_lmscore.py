"""Bigram-LM perplexity scoring (operators/lmscore.py)."""

import math

from wpextract_spark.operators import cache
from wpextract_spark.operators.lmscore import bigram_lm_model, lm_perplexity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_tiny_corpus(spark):
    # corpus: "a b a b" and "a b c" -> bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    # V = 3; c1(a)=3, c1(b)=2
    docs = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    got = {r["doc_id"]: r for r in lm_perplexity(docs, alpha=0.1).collect()}
    p_ab = (3 + 0.1) / (3 + 0.3)
    p_ba = (1 + 0.1) / (2 + 0.3)
    p_bc = (1 + 0.1) / (2 + 0.3)
    nll1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    nll2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 2
    assert abs(got[1]["avg_nll"] - nll1) < 1e-6
    assert abs(got[2]["ppl"] - math.exp(nll2)) < 1e-5
    cache.release("lm_score")


def test_fluent_scores_below_gibberish(spark):
    # 20 identical formulaic docs + 1 doc of singleton tokens: the formulaic
    # docs share high-count bigrams -> much lower perplexity.
    rows = [(i, "the cat sat on a mat") for i in range(20)]
    rows.append((99, "zq xw vv kj pq mn"))
    scored = {r["doc_id"]: r["ppl"] for r in lm_perplexity(_docs(spark, rows)).collect()}
    assert scored[0] == scored[19]
    # add-0.1 smoothing bounds the separation on a tiny vocab; the direction
    # and a healthy margin are the invariant, not a huge ratio
    assert scored[99] > 1.5 * scored[0]
    cache.release("lm_score")


def test_external_model_drops_unseen_bigrams(spark):
    ref = _docs(spark, [(1, "a b c")])
    model = bigram_lm_model(ref, alpha=0.1)
    # target doc has bigrams (a,b) [seen] and (b,z) [unseen -> dropped]
    got = lm_perplexity(_docs(spark, [(7, "a b z")]), model=model).collect()
    assert len(got) == 1 and got[0]["n_bigrams"] == 1
    cache.release("lm_score")


def test_null_and_short_docs_excluded(spark):
    docs = _docs(spark, [(1, "a b"), (2, None), (3, "solo")])
    ids = {r["doc_id"] for r in lm_perplexity(docs).collect()}
    assert ids == {1}
    cache.release("lm_score")


def test_model_join_not_corpus_sized_plan(spark):
    """The scoring join must read the persisted model (InMemoryTableScan),
    never re-derive it from a third corpus lineage."""
    docs = _docs(spark, [(i, "a b c d e") for i in range(10)])
    df = lm_perplexity(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    cache.release("lm_score")

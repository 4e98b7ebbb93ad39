"""Bigram PMI collocations: hand-computed values, short-doc edge cases."""

import math

from wpextract_spark.operators.textstats import collocations


def test_collocations_pmi_values(spark):
    # Corpus: "a b" x3, "a c" x1, plus a one-token doc (no bigrams) and an
    # empty doc (single '' token after split — still no bigrams).
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "x"), (6, "")],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi"])
        for r in collocations(docs, min_pair_count=2).collect()
    }
    # unigrams: a=4, b=3, c=1, x=1, ''=1 -> N=10; bigrams: (a,b)=3, (a,c)=1 -> B=4
    assert set(out) == {("a", "b")}  # (a,c) pruned by min_pair_count=2
    count, pmi = out[("a", "b")]
    assert count == 3
    assert pmi == round(math.log(3 * 10.0 * 10.0 / (4.0 * 4 * 3)), 6)


def test_collocations_empty_corpus(spark):
    docs = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert collocations(docs, min_pair_count=1).count() == 0

"""Inverted index: tf-ranked posting order, k-bound, min_df gate."""

from wpextract_spark.operators.textstats import inverted_index


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana cherry"),
            (3, "apple cherry"),
            (4, "date"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["token"]: (r["doc_freq"], r["postings"])
        for r in inverted_index(docs, min_df=2, postings_k=2).collect()
    }
    # 'date' appears in one doc -> pruned by min_df=2
    assert "date" not in out
    # apple: tf 2 in doc1, 1 in docs 2 and 3 -> doc1 first, then lowest id;
    # k=2 truncates doc 3 but doc_freq still counts it
    assert out["apple"] == (3, [1, 2])
    # banana: tf 2 in doc2 beats tf 1 in doc1
    assert out["banana"] == (2, [2, 1])
    # cherry: tf ties -> doc id ascending
    assert out["cherry"] == (2, [2, 3])

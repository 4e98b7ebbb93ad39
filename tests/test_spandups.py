"""Cross-document span duplication: span semantics, distinct counting, and
the document-frequency cap."""

from wpextract_spark.operators.dedup import span_dup_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _words(k, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(k))


def test_shared_span_detected(spark):
    span = _words(13)
    docs = _df(
        spark,
        [
            (0, "intro " + span + " outro"),
            (1, "different head " + span),
            (2, _words(13, "z")),
        ],
    )
    rows = span_dup_pairs(docs, n=13).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)


def test_counts_distinct_shared_spans(spark):
    text = _words(15)  # 3 distinct 13-grams
    docs = _df(spark, [(0, text), (1, text)])
    assert span_dup_pairs(docs, n=13).collect()[0]["n_shared_spans"] == 3


def test_repeated_span_in_one_doc_counted_once(spark):
    span = _words(13)
    docs = _df(spark, [(0, span + " x " + span), (1, span)])
    assert span_dup_pairs(docs, n=13).collect()[0]["n_shared_spans"] == 1


def test_gram_frequency_cap_drops_boilerplate(spark):
    span = _words(13)
    docs = _df(spark, [(i, span) for i in range(6)])
    assert span_dup_pairs(docs, n=13, max_gram_docs=5).count() == 0
    assert span_dup_pairs(docs, n=13, max_gram_docs=None).count() == 15


def test_short_docs_yield_nothing(spark):
    docs = _df(spark, [(0, "a b c"), (1, "a b c"), (2, "")])
    assert span_dup_pairs(docs, n=13).count() == 0

"""n-gram decontamination: exact window semantics, short-doc edge, and the
broadcast-join plan shape."""

from wpextract_spark.operators.decontam import ngram_decontaminate


def _df(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


def test_flags_exact_window_overlap(spark):
    bench_text = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _df(
        spark,
        [
            (0, "prefix words here " + bench_text + " suffix tail"),  # hit
            (1, "totally unrelated content with no overlap at all whatsoever "
                "for sure definitely nothing shared here my friend"),   # miss
            (2, bench_text),                                            # hit
        ],
    )
    bench = _df(spark, [(0, bench_text)])
    out = {r["doc_id"]: (r["contaminated"], r["n_contaminated_grams"])
           for r in ngram_decontaminate(docs, bench, n=13).collect()}
    assert out[0][0] and out[2][0]
    assert not out[1][0] and out[1][1] == 0
    # doc 2 == the 13-token... bench_text is 13 tokens -> exactly 1 gram
    assert out[2][1] == 1


def test_case_and_whitespace_insensitive(spark):
    words = " ".join(f"w{i}" for i in range(13))
    docs = _df(spark, [(0, words.upper().replace(" ", "\t"))])
    bench = _df(spark, [(0, words)])
    assert ngram_decontaminate(docs, bench).collect()[0]["contaminated"]


def test_short_docs_never_contaminated(spark):
    docs = _df(spark, [(0, "only five words right here"), (1, "")])
    bench = _df(spark, [(0, "only five words right here")])
    rows = ngram_decontaminate(docs, bench, n=13).collect()
    assert len(rows) == 2 and not any(r["contaminated"] for r in rows)


def test_multiplicity_counted_on_doc_side(spark):
    gram = " ".join(f"t{i}" for i in range(13))
    docs = _df(spark, [(0, gram + " filler " + gram)])
    bench = _df(spark, [(0, gram)])
    row = ngram_decontaminate(docs, bench).collect()[0]
    assert row["n_contaminated_grams"] == 2


def test_benchmark_side_is_broadcast(spark):
    docs = _df(spark, [(0, "a b c")])
    bench = _df(spark, [(0, "a b c")])
    plan = ngram_decontaminate(docs, bench, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

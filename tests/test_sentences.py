"""Sentence segmentation: abbreviation protection, terminator runs, tails."""

from pyspark.sql import functions as F

from wpextract_spark.operators.sentences import sentence_stats, split_sentences


def _split(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(split_sentences("text").alias("s")).collect()[0]["s"]


def test_basic_split(spark):
    assert _split(spark, "One. Two! Three? Four") == [
        "One.", "Two!", "Three?", "Four",
    ]


def test_abbreviations_do_not_split(spark):
    got = _split(
        spark,
        "Dr. Watson met Mr. Holmes at St. James. They left e.g. quickly.",
    )
    assert got == [
        "Dr. Watson met Mr. Holmes at St. James.",
        "They left e.g. quickly.",
    ]


def test_terminator_runs_attach_to_preceding_text(spark):
    # a maximal [.!?]+ run is one boundary: "?!" stays together, and an
    # ellipsis deterministically ends its sentence (the documented rule —
    # mid-sentence ellipses are ambiguous and this splitter never guesses)
    assert _split(spark, "What?! Really... yes.") == [
        "What?!", "Really...", "yes.",
    ]


def test_empty_and_unterminated(spark):
    assert _split(spark, "") == []
    assert _split(spark, "no terminator at all") == ["no terminator at all"]


def test_sentence_stats_exact_integers(spark):
    df = spark.createDataFrame(
        [(1, "Hi. Bye!"), (2, "One"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in sentence_stats(df).collect()}
    assert set(rows) == {1, 2}  # null text filtered
    assert rows[1]["n_sentences"] == 2
    assert rows[1]["sentence_chars"] == len("Hi.") + len("Bye!")
    assert rows[1]["max_sentence_len"] == 4
    assert rows[1]["first_sentence"] == "Hi."
    assert rows[2] == {
        "doc_id": 2,
        "n_sentences": 1,
        "sentence_chars": 3,
        "max_sentence_len": 3,
        "first_sentence": "One",
    }


def test_no_shuffle_map_only_plan(spark):
    # at 10^12 documents this must stay a single narrow map stage
    df = spark.createDataFrame([(1, "A. B.")], "doc_id long, text string")
    plan = sentence_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sentence_chunks_respect_boundaries(spark):
    from wpextract_spark.operators.sentences import sentence_chunks

    # sentences of len 8 ("Sent 01." etc); chunk_chars=20 -> starts at
    # 0, 9, 18, 27 -> chunks 0, 0, 0, 1
    text = "Sent 01. Sent 02. Sent 03. Sent 04."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["chunk_id"]: r.asDict()
        for r in sentence_chunks(df, chunk_chars=20).collect()
    }
    assert rows[0]["chunk_text"] == "Sent 01. Sent 02. Sent 03."
    assert rows[0]["n_sentences"] == 3
    assert rows[1]["chunk_text"] == "Sent 04."
    assert rows[1]["chunk_len"] == 8
    # no sentence is ever split: rebuilding the doc from ordered chunks
    # round-trips exactly
    rebuilt = " ".join(rows[k]["chunk_text"] for k in sorted(rows))
    assert rebuilt == text


def test_sentence_chunks_never_split_a_long_sentence(spark):
    from wpextract_spark.operators.sentences import sentence_chunks

    long_sent = "word " * 30 + "end."  # 154 chars, >> chunk_chars
    df = spark.createDataFrame(
        [(1, long_sent + " Short after.")], "doc_id long, text string"
    )
    rows = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in sentence_chunks(df, chunk_chars=50).collect()
    )
    # the long sentence stays whole in chunk 0; the next sentence starts
    # at offset 155 -> chunk 3 (ids are offset-derived, not dense)
    assert rows[0] == (0, long_sent)
    assert rows[1] == (3, "Short after.")

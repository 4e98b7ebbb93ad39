"""Overlapping word-window chunking (operators/chunking.py)."""

import pytest

from wpextract_spark.operators.chunking import chunk_documents


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_windows_cover_and_overlap(spark):
    words = [f"w{i}" for i in range(25)]
    docs = _docs(spark, [" ".join(words)])
    got = sorted(
        chunk_documents(docs, chunk_size=10, overlap=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    # n=25, stride=6 -> n_chunks = 1 + ceil(15/6) = 4
    assert [r["start_word"] for r in got] == [0, 6, 12, 18]
    assert [r["n_words"] for r in got] == [10, 10, 10, 7]
    assert got[0]["chunk_text"].split() == words[0:10]
    assert got[3]["chunk_text"].split() == words[18:25]
    # every word appears in at least one chunk; overlap words in exactly two
    covered = set()
    for r in got:
        covered.update(range(r["start_word"], r["start_word"] + r["n_words"]))
    assert covered == set(range(25))


def test_short_doc_single_chunk(spark):
    got = chunk_documents(_docs(spark, ["a b c"]), chunk_size=10, overlap=2).collect()
    assert len(got) == 1
    assert got[0]["n_words"] == 3 and got[0]["chunk_text"] == "a b c"


def test_exact_boundary_no_empty_tail(spark):
    # n == chunk_size -> exactly one chunk, not a zero-word tail
    got = chunk_documents(
        _docs(spark, [" ".join("x" * 1 for _ in range(8))]), chunk_size=8, overlap=2
    ).collect()
    assert len(got) == 1 and got[0]["n_words"] == 8


def test_whitespace_only_doc_one_empty_chunk(spark):
    got = chunk_documents(_docs(spark, ["   "]), chunk_size=4, overlap=1).collect()
    assert len(got) == 1 and got[0]["chunk_text"] == ""


def test_overlap_must_be_smaller(spark):
    with pytest.raises(ValueError, match="must be <"):
        chunk_documents(_docs(spark, ["x"]), chunk_size=4, overlap=4)


def test_zero_shuffle_plan(spark):
    docs = _docs(spark, ["a b c d e f g h"])
    plan = (
        chunk_documents(docs, chunk_size=4, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # row-local transform + explode only

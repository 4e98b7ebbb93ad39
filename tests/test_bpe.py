"""Real BPE (operators/bpe.py): trainer determinism, merge-application
semantics, broadcast-apply encoding, and sequence-pack integration."""

import pytest
from pyspark.sql import functions as F

from wpextract_spark.operators.bpe import (
    SEP,
    _apply_merge,
    _apply_merges,
    _symbols,
    _wrap,
    bpe_encode,
    bpe_encode_udf,
    bpe_token_count_expr,
    bpe_train,
    bpe_vocab,
)


def test_merge_application_leftmost_nonoverlapping():
    # [a,b,a,b] + (a,b) -> [ab, ab]: adjacent occurrences both merge
    assert _symbols(_apply_merge(_wrap("abab"), "a", "b")) == ["ab", "ab"]
    # [a,a,a] + (a,a) -> [aa, a]: greedy left-to-right, no overlap
    assert _symbols(_apply_merge(_wrap("aaa"), "a", "a")) == ["aa", "a"]
    # chained merges build longer tokens
    out = _apply_merges(_wrap("abcabc"), [("a", "b"), ("ab", "c")])
    assert _symbols(out) == ["abc", "abc"]


def test_train_learns_expected_merges(spark):
    # 'banana' x3, 'bandana' x1: 'an' dominates (2*3 + 2*1 = 8 pairs)
    docs = spark.createDataFrame(
        [(0, "banana banana"), (1, "banana bandana")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=3)
    assert merges[0] == ("a", "n")
    assert len(merges) == 3
    assert bpe_vocab(merges)[0] == "an"


def test_train_tiebreak_is_lexicographic(spark):
    # 'xy' and 'ab' both appear exactly twice: smallest pair wins
    docs = spark.createDataFrame(
        [(0, "ab xy ab xy")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=1)
    assert merges == [("a", "b")]


def test_train_stops_when_no_pairs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c a")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=10)
    assert merges == []  # every word is a single symbol already


def test_max_words_cap(spark):
    docs = spark.createDataFrame(
        [(0, "zz zz zz yy yy xx")], "doc_id long, text string"
    )
    # cap to the single most frequent word: only 'zz' trains
    merges = bpe_train(docs, n_merges=1, max_words=1)
    assert merges == [("z", "z")]


def test_encode_counts_match_manual(spark):
    docs = spark.createDataFrame(
        [(0, "banana banana"), (1, "banana bandana"), (2, None)],
        "doc_id long, text string",
    )
    trainable = docs.where(F.col("text").isNotNull())
    merges = bpe_train(trainable, n_merges=2)
    got = {
        r["doc_id"]: r
        for r in bpe_encode(docs, merges).collect()
    }

    def n_toks(word):
        return len(_symbols(_apply_merges(_wrap(word), merges)))

    assert got[0]["n_tokens"] == 2 * n_toks("banana")
    assert got[1]["n_tokens"] == n_toks("banana") + n_toks("bandana")
    assert got[0]["n_words"] == 2
    assert got[2]["n_tokens"] is None  # null text quarantines to null


def test_encode_udf_returns_real_token_stream(spark):
    docs = spark.createDataFrame([(0, "banana band")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=2)
    row = docs.select(
        bpe_encode_udf(merges)(F.col("text")).alias("toks")
    ).collect()[0]
    # tokens concatenate back to the original words (lossless round-trip)
    assert "".join(row["toks"]) == "bananaband"
    expected = _symbols(_apply_merges(_wrap("banana"), merges)) + _symbols(
        _apply_merges(_wrap("band"), merges)
    )
    assert row["toks"] == expected


def test_sequence_pack_with_real_bpe_counts(spark):
    """sequence_pack(token_counter=bpe_token_count_expr(...)) packs GENUINE
    token streams: offsets are exclusive prefix sums of the real per-doc
    BPE token counts (+1 EOS), and every packed document round-trips
    through the merges."""
    from wpextract_spark.operators.packing import sequence_pack

    rows = [(i, " ".join(["banana", "band", "ana"][j % 3] for j in range(i + 1)))
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=3)
    packed = sequence_pack(
        docs,
        seq_len=16,
        bucket_width=4,
        token_counter=bpe_token_count_expr(merges),
    ).collect()
    by_id = {r["doc_id"]: r for r in sorted(packed, key=lambda r: r["doc_id"])}

    def real_count(text):
        return (
            sum(
                len(_symbols(_apply_merges(_wrap(w), merges)))
                for w in text.split()
            )
            + 1  # EOS
        )

    offset = 0
    for i in range(20):
        row = by_id[i]
        expect = real_count(rows[i][1])
        assert row["n_tokens"] == expect
        assert row["offset"] == offset
        assert row["seq_index"] == offset // 16
        offset += expect


def test_sep_never_collides_with_corpus():
    assert SEP == "\x1f"
    assert SEP not in "banana band ana 0123 .,!?"

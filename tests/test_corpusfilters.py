"""Corpus-curation filter tests: Gopher repetition/quality rules, CCNet-style
cross-document line dedup, and sequential PII scrubbing.

Hand-computed expectations on tiny corpora pin the semantics the sf0.01
oracle checks at scale (q_repetition_stats, q_gopher_quality, q_line_dedup,
q_pii_scrub)."""

import pytest

from wpextract_spark.operators.corpusfilters import (
    c4_line_filter,
    gopher_quality_flags,
    line_dedup,
    pii_scrub,
    repetition_stats,
    source_cap,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_top_gram(spark):
    # "a b a b a b c": 7 words, 3 distinct; top 2-gram "a b" x3 (len 3),
    # top 3-gram "a b a" x2 vs "b a b" x2 -> tie broken by greatest gram.
    df = _docs(spark, [(1, "a b a b a b c")])
    row = repetition_stats(df).collect()[0]
    assert row["n_words"] == 7
    assert row["dup_word_frac"] == pytest.approx((7 - 3) / 7, abs=1e-6)
    assert row["top2_gram_char_frac"] == pytest.approx(3 * 3 / 13, abs=1e-6)
    assert row["top3_gram_char_frac"] == pytest.approx(2 * 5 / 13, abs=1e-6)


def test_repetition_stats_double_digit_n(spark):
    # n >= 10 exercises the multi-char tag prefix: a fixed 1-char parse
    # would read '10:w0 ... w9' as n='1', gram='0:w0 ...' (ADVICE r2).
    words = " ".join(f"w{i}" for i in range(10))
    text = words + " " + words  # the 10-gram "w0..w9" occurs twice
    row = repetition_stats(_docs(spark, [(1, text)]), ns=(2, 10)).collect()[0]
    gram_len = len(words)
    assert row["top10_gram_char_frac"] == pytest.approx(
        2 * gram_len / len(text), abs=1e-6
    )
    assert row["top2_gram_char_frac"] > 0.0


def test_repetition_stats_short_doc_zero_fracs(spark):
    # One word: no 2-grams/3-grams exist -> fractions are 0, not null.
    row = repetition_stats(_docs(spark, [(1, "solo")])).collect()[0]
    assert row["dup_word_frac"] == 0.0
    assert row["top2_gram_char_frac"] == 0.0
    assert row["top3_gram_char_frac"] == 0.0


def test_gopher_quality_flags(spark):
    good = " ".join(f"word{i}" for i in range(60))  # 60 words, mean len ~6
    short = "too few words"
    symbols = " ".join(["ok#"] * 60)  # symbol_ratio 1.0
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            _docs(spark, [(1, good), (2, short), (3, symbols)])
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False  # n_words < 50
    assert out[2]["n_words"] == 3
    assert out[3]["keep"] is False  # symbol ratio 1.0 > 0.1
    assert out[3]["symbol_ratio"] == pytest.approx(1.0)
    assert out[1]["alpha_word_frac"] == pytest.approx(1.0)


def test_line_dedup_cross_document(spark):
    # "All rights reserved" (case/whitespace-insensitive) appears in both
    # docs -> dropped from both; unique lines survive in original order.
    df = _docs(
        spark,
        [
            (1, "intro one\nAll rights reserved\nbody one"),
            (2, "body two\n  all rights reserved  "),
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["text_clean"] == "intro one\nbody one"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[2]["text_clean"] == "body two"
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1


def test_line_dedup_within_document(spark):
    # A line repeated inside ONE doc also reaches min_count.
    df = _docs(spark, [(1, "chorus\nverse\nchorus")])
    row = line_dedup(df).collect()[0]
    assert row["text_clean"] == "verse"
    assert row["n_kept"] == 1


def test_pii_scrub_sequential(spark):
    text = "mail a.user+tag@example.com or 10.0.0.1 or +1 555 123 4567 end"
    row = pii_scrub(_docs(spark, [(1, text)])).collect()[0]
    assert row["text_scrubbed"] == "mail <EMAIL> or <IP> or <PHONE> end"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (1, 1, 1)


def test_c4_line_filter_rules(spark):
    text = "\n".join(
        [
            "This line has enough words and ends properly.",  # kept
            "Short line.",  # < 5 words
            "This one has plenty of words but no terminal punct",  # no punct
            "Enable JavaScript to view the full comments here.",  # javascript
            'He said "use five or more words."',  # ends in quote: kept
        ]
    )
    row = c4_line_filter(_docs(spark, [(1, text)])).collect()[0]
    assert row["text_clean"] == (
        'This line has enough words and ends properly.\nHe said "use five or more words."'
    )
    assert row["n_lines"] == 5 and row["n_kept"] == 2
    assert row["keep"] is False  # only 2 kept lines < 3


def test_c4_page_flags(spark):
    good = "\n".join(["A good sentence with many words here."] * 3)
    lorem = good + "\nLorem Ipsum dolor sit amet and then some."
    braces = good.replace("here.", "here {ok}.")
    out = {
        r["doc_id"]: r["keep"]
        for r in c4_line_filter(
            _docs(spark, [(1, good), (2, lorem), (3, braces)])
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_source_cap(spark):
    rows = [(i, f"s{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_cap(df, max_per_source=3).collect()
    kept = sorted(r["doc_id"] for r in out if r["keep"])
    assert kept == [0, 1, 2, 3, 4, 5]  # first 3 of each source by doc_id
    ranks = {r["doc_id"]: r["rank_in_source"] for r in out}
    assert ranks[8] == 5 and ranks[9] == 5


def test_pii_scrub_email_digits_not_double_counted(spark):
    # The email's digit run must not survive to be counted as a phone.
    text = "contact 12345678901@example.com please"
    row = pii_scrub(_docs(spark, [(1, text)])).collect()[0]
    assert row["n_emails"] == 1
    assert row["n_phones"] == 0
    assert row["text_scrubbed"] == "contact <EMAIL> please"


def test_url_filter_blocklist_and_score(spark):
    from wpextract_spark.operators.corpusfilters import url_filter

    rows = [
        (1, "https://ads.spam.example.org/x"),          # parent-domain block
        (2, "https://spam.example.org/y"),              # exact block
        (3, "https://good.example.org/casino/z"),       # word score 1.0
        (4, "https://good.example.org/free-download"),  # 0.5 -> keep
        (5, "https://good.example.org/free-download/winner-casino"),  # 1.75
        (6, "https://good.example.org/plain"),
        (7, "https://GOOD.example.org/CASINO"),         # case-insensitive
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r.asDict()
        for r in url_filter(docs, ["spam.example.org"]).collect()
    }
    assert got[1]["domain_blocked"] and not got[1]["keep"]
    assert got[2]["domain_blocked"] and not got[2]["keep"]
    assert not got[3]["domain_blocked"] and got[3]["url_score"] == 1.0 and not got[3]["keep"]
    assert got[4]["url_score"] == 0.5 and got[4]["keep"]
    assert got[5]["url_score"] == 1.75 and not got[5]["keep"]
    assert got[6]["url_score"] == 0.0 and got[6]["keep"]
    assert got[7]["url_score"] == 1.0 and got[7]["domain"] == "good.example.org"


def test_url_filter_dataframe_blocklist_agrees_with_list(spark):
    from wpextract_spark.operators.corpusfilters import url_filter

    rows = [
        (i, f"https://{'ads.' if i % 3 == 0 else ''}site{i % 5}.example.org/p{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = ["site2.example.org", "ads.site0.example.org"]
    via_list = url_filter(docs, blocked).orderBy("doc_id").collect()
    bl = spark.createDataFrame([(d,) for d in blocked], "bdomain string")
    via_df = url_filter(docs, bl).orderBy("doc_id").collect()
    assert [r.asDict() for r in via_list] == [r.asDict() for r in via_df]


def test_url_filter_list_mode_plan_has_no_exchange(spark):
    from wpextract_spark.operators.corpusfilters import url_filter

    docs = spark.createDataFrame([(1, "https://a.example.org/x")], "doc_id long, url string")
    plan = (
        url_filter(docs, ["b.example.org"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure row-local expressions


def test_url_filter_df_mode_broadcasts_blocklist(spark):
    from wpextract_spark.operators.corpusfilters import url_filter

    docs = spark.createDataFrame(
        [(i, f"https://s{i}.example.org/x") for i in range(20)],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("s3.example.org",)], "bdomain string")
    plan = url_filter(docs, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

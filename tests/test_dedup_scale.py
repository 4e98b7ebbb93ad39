"""Scale-hardening semantics of the near-dup operators: 64-bit SimHash
signatures, multi-probe embedding LSH, and the mega-bucket guards that keep
one degenerate bucket from turning the candidate self-join quadratic."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),
        (3, "completely different words about spark shuffles and parquet scans"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_finds_exact_pair_at_64_bits(docs):
    from wpextract_spark.operators.dedup import simhash_near_dup_pairs

    pairs = simhash_near_dup_pairs(docs).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_simhash_signature_uses_upper_bits(spark):
    """Bits 32..63 must come from the second hash, not degenerate to 0 —
    otherwise half the bands are constant-key mega buckets."""
    from wpextract_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(i, f"word{i} token{i} item{i} thing{i}") for i in range(40)],
        "doc_id long, text string",
    )
    sigs = [r["simhash"] for r in simhash(df, bits=64).collect()]
    assert all(len(s) == 64 for s in sigs)
    upper_halves = {s[32:] for s in sigs}
    assert len(upper_halves) > 1  # not constant across docs


def test_simhash_mega_bucket_cap(spark):
    from wpextract_spark.operators.dedup import simhash_near_dup_pairs

    n = 12
    df = spark.createDataFrame(
        [(i, "same boilerplate text repeated on every page") for i in range(n)],
        "doc_id long, text string",
    )
    uncapped = simhash_near_dup_pairs(df, max_bucket=None).count()
    assert uncapped == n * (n - 1) // 2
    capped = simhash_near_dup_pairs(df, max_bucket=5).count()
    assert capped == 0  # every chunk bucket holds all 12 docs -> dropped


def test_embedding_near_dups_multiset_and_cap(spark):
    from wpextract_spark.operators.similarity import embedding_near_dup_pairs

    dim = 16
    base = [1.0 if i % 3 == 0 else -0.5 for i in range(dim)]
    other = [(-1.0) ** i * (i + 1) / dim for i in range(dim)]
    rows = [(1, base), (2, list(base)), (3, other)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pairs = embedding_near_dup_pairs(df, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["cos_sim"] == pytest.approx(1.0)

    # A mass of identical vectors collapses into one bucket per plane set:
    # the cap drops those buckets entirely instead of emitting O(N^2) pairs.
    clones = spark.createDataFrame(
        [(i, base) for i in range(10)], "vec_id long, embedding array<float>"
    )
    assert embedding_near_dup_pairs(clones, threshold=0.99, max_bucket=4).count() == 0
    assert embedding_near_dup_pairs(clones, threshold=0.99, max_bucket=None).count() == 45


def test_kmeans_centroids_converge_and_stay_deterministic(spark):
    from wpextract_spark.operators.similarity import ivf_topk, kmeans_centroids

    # Two well-separated clusters around orthogonal axes + the first two
    # vectors as seeds: one iteration must pull each centroid to its
    # cluster's mean direction.
    dim = 8
    rows = []
    for i in range(20):
        axis = i % 2
        vec = [0.0] * dim
        vec[axis] = 1.0
        vec[(axis + 2) % dim] = 0.05 * (i % 5)  # slight spread
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = kmeans_centroids(df, n_lists=2, n_iter=2)
    assert [cid for cid, _ in cents] == [0, 1]
    c0, c1 = (dict(cents)[0], dict(cents)[1])
    assert c0[0] > 0.9 and c1[1] > 0.9  # each centroid on its axis
    # Deterministic across repeated runs (rounded means, fixed seeds).
    assert kmeans_centroids(df, n_lists=2, n_iter=2) == cents

    # Search through the trained quantizer returns the axis-0 cluster for an
    # axis-0 query.
    query = [1.0] + [0.0] * (dim - 1)
    got = ivf_topk(df, query, k=5, n_probe=1, centroids=cents).collect()
    assert all(r["vec_id"] % 2 == 0 for r in got)


def test_lang_id_ngram_and_bpe_edges(spark):
    from pyspark.sql import functions as F

    from wpextract_spark.operators.textstats import bpe_token_stats, lang_id_ngram

    docs = spark.createDataFrame(
        [
            (1, "the thing in the thicket"),   # en trigrams
            (2, "les questions entre les eaux"),  # fr trigrams
            (3, "xq"),                          # too short -> null
            (4, None),                          # null -> null
            (5, "zzzz qqqq"),                   # no profile hits -> und
            (6, "it's 42 degrees, isn't it?"),
        ],
        "doc_id long, text string",
    )
    langs = {r["doc_id"]: r["lang_guess"] for r in lang_id_ngram(docs).collect()}
    assert langs[1] == "en" and langs[2] == "fr"
    assert langs[3] is None and langs[4] is None
    assert langs[5] == "und"

    bpe = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    # "it's 42 degrees, isn't it?" -> it|'s| 42| degrees|,| isn|'t| it|?
    assert bpe[6]["n_bpe_tokens"] == 9
    assert bpe[6]["n_ws_tokens"] == 5
    assert bpe[4]["n_bpe_tokens"] is None or bpe[4]["n_bpe_tokens"] == 0


def test_lang_id_whitespace_only_text(spark):
    """Whitespace-only text (tabs/newlines, not just spaces) must yield NULL
    from the stopword lang-id — and the oracle agrees (DuckDB trim() alone
    only strips spaces)."""
    import duckdb

    from wpextract_spark.operators.textstats import lang_id
    from wpextract_spark.plans.queries import _oracle_lang_id

    docs = spark.createDataFrame(
        [(1, "\n\t\n"), (2, "   "), (3, "the of and")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["lang_guess"] for r in lang_id(docs).collect()}
    assert got[1] is None and got[2] is None and got[3] == "en"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, chr(10) || chr(9) || chr(10)), (2, '   '), (3, 'the of and')"
        ") t(doc_id, text)"
    )
    oracle = {r[0]: r[1] for r in con.execute(_oracle_lang_id()).fetchall()}
    assert oracle == got


def test_short_docs_dont_kill_ngram_jaccard(spark):
    """Docs with fewer than n words yield no grams — they must not abort the
    stage (sequence(0, negative) descends into an invalid slice)."""
    from wpextract_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "one two three four same words here"),
         (4, "one two three four same words here")],
        "doc_id long, text string",
    )
    rows = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(3, 4)]


def test_embedding_near_dups_empty_input(spark):
    from wpextract_spark.operators.similarity import embedding_near_dup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(empty, threshold=0.5)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cos_sim"]


def test_salted_join_rejects_right_preserving_joins(spark):
    import pytest

    from wpextract_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "x")], "k long, v string")
    right = spark.createDataFrame([(2, "y")], "k long, w string")
    with pytest.raises(ValueError, match="left-preserving"):
        salted_join(left, right, ["k"], how="full")
    # left join: unmatched left row survives exactly once
    assert salted_join(left, right, ["k"], how="left").count() == 1


def test_containment_catches_quotes_jaccard_misses(spark):
    from wpextract_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    long_words = " ".join(f"w{i}" for i in range(200))
    quote = " ".join(f"w{i}" for i in range(40, 52))  # verbatim slice
    docs = spark.createDataFrame(
        [("full", long_words), ("quote", quote), ("other", "x y z q r s t")],
        ["doc_id", "text"],
    )
    got = {
        (r.id_a, r.id_b): r for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert ("full", "quote") in got
    row = got[("full", "quote")]
    assert row.cont_b_in_a == 1.0  # the quote is fully contained
    assert row.cont_a_in_b < 0.1
    # symmetric jaccard at any near-dup threshold misses the same pair
    assert not ngram_jaccard_pairs(docs, threshold=0.5).collect()


def test_containment_verify_path_matches_direct(spark):
    from wpextract_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            ("a", "p q r s t u v"),
            ("b", "p q r s t u v extra tail words here"),
            ("c", "unrelated text entirely different words"),
        ],
        ["doc_id", "text"],
    )
    direct = {
        (r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    cands = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["id_a", "id_b"]
    )
    verified = {
        (r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(docs, threshold=0.9, candidates=cands).collect()
    }
    assert direct == verified == {("a", "b"): (1.0, 0.555556)}


def test_containment_short_docs_never_divide_by_zero(spark):
    from wpextract_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [("a", "one two"), ("b", ""), ("c", "one two")], ["doc_id", "text"]
    )
    assert containment_pairs(docs).collect() == []  # gram-less: no pairs

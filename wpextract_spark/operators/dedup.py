"""Deduplication operators for training-data pipelines.

All variants are pure DataFrame algebra over built-in JVM functions (no Python
in the hot path): hashing uses ``md5`` over UTF-8 so the semantics are
reproducible in any engine (the DuckDB oracles run the same expressions).

Scale notes:
* exact dedup: one hash + one shuffle on the hash key (uniform by design);
* MinHash: explode-distinct words is a flatMap + partial-agg (map-side
  combine) before the per-doc groupBy — the shuffle carries (doc, word-min)
  partial rows, not raw shingles;
* LSH banding: candidate generation shuffles on band keys; a band bucket with
  B docs yields B² candidate pairs, so bucket width is the skew knob — cap
  with more bands/rows at scale;
* n-gram Jaccard: the gram self-join is quadratic per shared gram — it is a
  verifier for candidate pairs, not a corpus-wide sweep (LSH prunes first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Split pattern for whitespace tokenization, shared with the oracles.
WS = r"\s+"


def _words(text_col: str):
    return F.split(F.trim(F.col(text_col)), WS)


def exact_duplicate_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, keep_id).

    ``keep_id`` is the smallest id (deterministic survivor policy); only
    groups with >1 member are returned.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """MinHash signature per document over the distinct-word set.

    Hash family i is ``md5(i || ':' || word)``; the min is taken over the hex
    string (fixed-width lowercase hex, so string order == value order). Output:
    (id, sig_0..sig_{k-1}).
    """
    exploded = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_words(text_col))).alias("w")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("w")))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Signature split into ``bands`` rows of ``k/bands`` values; docs sharing a
    band bucket become a candidate pair (a < b). Output: (id_a, id_b, n_bands)
    with the number of agreeing bands.
    """
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows = k // bands
    sig = minhash_signatures(docs, id_col, text_col, k)
    band_cols = [
        F.concat_ws("|", F.lit(b), *[F.col(f"sig_{b * rows + r}") for r in range(rows)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("band_key"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, F.col("l.band_key") == F.col("r.band_key"))
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Document pairs with word-``n``-gram Jaccard similarity >= threshold.

    Output: (id_a, id_b, jaccard). Quadratic in per-gram document frequency —
    use after LSH candidate pruning at scale.
    """
    words = _words(text_col)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    with_grams = docs.select(F.col(id_col), grams.alias("grams")).where(F.size("grams") > 0)
    sizes = with_grams.select(F.col(id_col), F.size("grams").alias("n_grams"))
    exploded = with_grams.select(F.col(id_col), F.explode("grams").alias("g"))

    pairs = (
        exploded.alias("l")
        .join(exploded.alias("r"), F.col("l.g") == F.col("r.g"))
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({id_col: "id_a", "n_grams": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_grams": "nb"}), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash signature (as a 0/1 string) from distinct-word bit votes.

    Bit ``b`` of word ``w`` is the high bit of hex nibble ``b`` of
    ``md5(w)`` (i.e. nibble in [8..f]) — chosen so the identical expression
    runs in SQL engines for oracle checks. Output: (id, simhash string).
    """
    exploded = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_words(text_col))).alias("w")
    ).withColumn("h", F.md5(F.col("w")))
    votes = [
        F.sum(
            F.when(F.substring("h", b + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    voted = exploded.groupBy(id_col).agg(*votes)
    sig = F.concat(
        *[F.when(F.col(f"v_{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)]
    )
    return voted.select(F.col(id_col), sig.alias("simhash"))

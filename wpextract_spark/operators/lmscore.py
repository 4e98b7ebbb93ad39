"""N-gram language-model perplexity scoring (CCNet-style quality signal).

The production web-corpus pipelines (CCNet, RedPajama, Gopher) keep or bucket
documents by the perplexity a small language model assigns them — fluent prose
scores low, boilerplate/gibberish scores high. This module implements the
fully-relational version: a bigram add-alpha LM *trained on the corpus
itself* (or on a separate reference corpus) and applied back per document.

Reference scope note: wpextract has no quality-model stage (its pipeline ends
at extraction, ``src/wpextract/extract.py``); this operator belongs to the
training-data-pipeline extension surface alongside the Gopher/C4 filters in
``operators/corpusfilters.py``.

Scale design (100 TB corpus):
* The corpus is scanned exactly TWICE — once to count bigrams (one shuffle
  with map-side combine), once to score documents. Everything else reads the
  persisted MODEL table, which is bigram-*type*-sized (vocabulary-bounded),
  not corpus-sized.
* Context totals and the probability expression derive FROM the bigram count
  table (vocab-sized input), never from a third corpus pass; the vocabulary
  size is a 1-row aggregate broadcast-cross-joined in — no eager action.
* The score join is bigram-keyed; for bounded vocabularies AQE broadcasts
  the model side, at web scale it degrades gracefully to a sort-merge join
  on (w1, w2) — both sides hash-partition on the same key.
* All probabilities are one double expression in the exact form the SQL
  oracle restates, rounded to 6 decimals after the per-document aggregate so
  engine ulp noise cannot reach a comparator (same contract as BM25/PMI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wpextract_spark.operators.textstats import _words


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — consecutive token pairs, row-local (zero shuffles)."""
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), _words(text_col).alias("ts")
    )
    return toks.where(F.size("ts") >= 2).select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.size("ts") - 1).alias("w1"),
                F.slice(F.col("ts"), 2, F.size("ts") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm_model(
    docs: DataFrame,
    alpha: float = 0.1,
    text_col: str = "text",
) -> DataFrame:
    """Train an add-alpha bigram LM: (w1, w2, logp) with
    ``P(w2|w1) = (c(w1,w2) + alpha) / (c(w1,·) + alpha·V)``.

    Returned persisted (registered under ``cache.release("lm_score")``) —
    it is read once per scoring join and is vocab-bounded, so the persist
    is cheap and saves a full corpus re-scan per consumer.
    """
    from pyspark import StorageLevel

    from wpextract_spark.operators.cache import track

    nn = docs.where(F.col(text_col).isNotNull())
    toks = nn.select(_words(text_col).alias("ts"))
    bi = _bigrams(nn.select(F.lit(0).alias("_id"), text_col), "_id", text_col)
    c12 = track(
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK),
        scope="lm_score",
    )
    ctx = c12.groupBy("w1").agg(F.sum("c").alias("c1"))
    vocab = toks.select(F.explode("ts").alias("t")).agg(
        F.countDistinct("t").cast("double").alias("v")
    )
    model = (
        c12.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    return track(
        model.persist(StorageLevel.MEMORY_AND_DISK), scope="lm_score"
    )


def lm_perplexity(
    docs: DataFrame,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_nll, ppl) per document with >= 1 bigram.

    ``ppl = exp(mean negative log-probability)`` under the bigram LM — the
    standard held-out-fluency quality signal. Pass ``model`` to score
    against an LM trained on a *different* (reference) corpus; by default
    the model is trained on ``docs`` itself (self-perplexity, the common
    "how typical is this document of the corpus" ranking).

    Every bigram is in-vocabulary when self-trained; with an external model
    the inner join drops unseen bigrams from the average (document it or
    pre-filter, depending on the filter's policy).
    """
    if model is None:
        model = bigram_lm_model(docs, alpha=alpha, text_col=text_col)
    bi = _bigrams(docs, id_col, text_col)
    return (
        bi.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(-F.col("logp")).alias("_nll"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            F.round(F.col("_nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.col("_nll")), 6).alias("ppl"),
        )
    )

"""Trained quality filter: logistic regression over the heuristic features.

The Gopher/C4 rules (`corpusfilters.py`) are hard thresholds; production
curation pipelines (CCNet, fastText-based filters, FineWeb-Edu) instead
*train* a classifier on labeled good/bad documents and keep by predicted
probability — the thresholds become learned weights, and new signals fold in
without re-tuning rules. This module wires the engine's existing per-row
quality expressions into a ``pyspark.ml`` pipeline.

Scale notes: feature extraction is the same whole-stage-codegen column
algebra the heuristic filters use (no UDFs); LBFGS logistic regression is a
handful of treeAggregate passes over the (tiny) feature vectors — the text
column never enters the iteration. Scoring is one broadcast of the weight
vector and a map-side projection: a trained filter costs the same per row as
a hard-threshold one. Training labels at corpus scale come from proxy sets
(kept-reference-corpus = positive, raw-crawl sample = negative), which is
how the published pipelines bootstrap — the trainer here takes any labeled
DataFrame.

Determinism: LBFGS on the same data/partitioning converges to the same
optimum within tolerance; tests assert ranking/separation, not bitwise
weights, and the driver-contract registry deliberately does NOT include a
trained model (the oracle gate requires engine-portable determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature column names, in assembler order.
QUALITY_FEATURES = [
    "n_words",
    "mean_word_len",
    "alpha_frac",
    "symbol_ratio",
    "stopword_frac",
    "dup_line_frac",
]

_WS = r"[ \t\n\x0B\f\r]+"
_STOPWORDS = ("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")


def quality_feature_columns(text_col: str = "text") -> list[Column]:
    """The per-row feature expressions — pure JVM column algebra shared by
    the trainer and the scorer (train/serve skew is a code-path identity
    here, not a convention)."""
    words = F.split(F.trim(F.col(text_col)), _WS)
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    symbols = F.length(F.regexp_replace(F.col(text_col), r"[^#@~^|\\{}<>]", ""))
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*_STOPWORDS))
    )
    lines = F.split(F.col(text_col), "\n")
    dup_lines = F.size(lines) - F.size(F.array_distinct(lines))
    g1 = F.greatest
    return [
        n_words.cast("double").alias("n_words"),
        (n_chars / g1(n_words, F.lit(1))).cast("double").alias("mean_word_len"),
        (alpha / g1(n_chars, F.lit(1))).cast("double").alias("alpha_frac"),
        (symbols / g1(n_chars, F.lit(1))).cast("double").alias("symbol_ratio"),
        (stop_hits / g1(n_words, F.lit(1))).cast("double").alias("stopword_frac"),
        (dup_lines / g1(F.size(lines), F.lit(1))).cast("double").alias("dup_line_frac"),
    ]


def _assembler():
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(
        inputCols=QUALITY_FEATURES, outputCol="features", handleInvalid="keep"
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the quality classifier on ``(text, label)`` rows (label 1 = keep).
    Returns a fitted ``pyspark.ml`` PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    feats = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        *quality_feature_columns(text_col),
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
        family="binomial",
    )
    return Pipeline(stages=[_assembler(), lr]).fit(feats)


def score_quality(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """(id, quality_prob, keep): predicted keep-probability per document."""
    from pyspark.ml.functions import vector_to_array

    feats = docs.select(F.col(id_col), *quality_feature_columns(text_col))
    scored = model.transform(feats)
    prob = F.element_at(vector_to_array("probability"), 2)
    return scored.select(
        F.col(id_col),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= threshold).alias("keep"),
    )

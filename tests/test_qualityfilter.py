"""Trained quality filter: the classifier must separate clean prose from
spam on held-out docs, and scoring must stay UDF-free column algebra."""

import pytest

from wpextract_spark.operators.qualityfilter import (
    quality_feature_columns,
    score_quality,
    train_quality_model,
)

GOOD = [
    "The committee published the final report of the year and it is a "
    "thorough document that covers the results in detail for everyone.",
    "It is a truth universally acknowledged that a reader in possession "
    "of a good book is in want of nothing further for the evening.",
    "The study describes the effect of the treatment and the outcome "
    "that it produced in a large population of volunteers over a decade.",
    "A quiet morning in the village and the market opened as it always "
    "does with bread and fruit and the sound of familiar conversation.",
]

BAD = [
    "$$$ WIN ###### @@@ CLICK {{{<<<>>>}}} |||| ^^^^ ~~~~ #@#@#@",
    "a a a a a a a a a a a a a a a a a a a a a a a a a a a a",
    "buy\nbuy\nbuy\nbuy\nbuy\nbuy\nbuy\nbuy\nbuy\nbuy\nbuy\nbuy",
    "zzz",
]


@pytest.fixture(scope="module")
def model(spark):
    rows = [(t, 1.0) for t in GOOD] + [(t, 0.0) for t in BAD]
    labeled = spark.createDataFrame(rows * 5, ["text", "label"])
    return train_quality_model(labeled, max_iter=30)


def test_separates_held_out_docs(spark, model):
    held = spark.createDataFrame(
        [
            (0, "The results of the survey were published in the spring and "
                "the numbers tell a story that it is hard to ignore."),
            (1, "### @@@ $$$ {{{ }}} <<< >>> ||| ^^^ ~~~ ### @@@ $$$"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in score_quality(held, model).collect()}
    assert out[0]["quality_prob"] > out[1]["quality_prob"]
    assert out[0]["keep"] and not out[1]["keep"]


def test_training_docs_scored_correctly(spark, model):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + BAD)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["quality_prob"] for r in score_quality(df, model).collect()}
    assert min(out[i] for i in range(len(GOOD))) > max(
        out[i] for i in range(len(GOOD), len(GOOD) + len(BAD))
    )


def test_features_are_pure_column_algebra(spark):
    df = spark.createDataFrame([(0, "hello world")], ["doc_id", "text"])
    plan = (
        df.select(*quality_feature_columns())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_feature_edge_cases_no_nan(spark):
    import math

    df = spark.createDataFrame([(0, ""), (1, "   "), (2, "\n\n")], ["doc_id", "text"])
    rows = df.select(*quality_feature_columns()).collect()
    for r in rows:
        for v in r:
            assert v is not None and not math.isnan(v)

"""Unicode canonicalization + dedup-key kernels and their Spark stages."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wpextract_spark.operators.textnorm import (
    _dedup_key,
    _normalize,
    dedup_key_udf,
    normalize_text_udf,
)


def norm1(s):
    return _normalize(pd.Series([s]))[0]


def key1(s):
    return _dedup_key(pd.Series([s]))[0]


def test_nfc_composes():
    assert norm1("café") == "café"


def test_punctuation_folds():
    assert norm1("“A” ‘b’ – — x…") == '"A" \'b\' - - x...'


def test_nbsp_and_zero_width():
    assert norm1("A B​C﻿D") == "A BCD"


def test_controls_stripped_newlines_kept():
    assert norm1("a\x00b\x07c\nd") == "abc\nd"


def test_hspace_collapsed_newlines_survive():
    assert norm1("a \t  b\r\nc") == "a b \nc"
    assert norm1("  lead trail  ") == "lead trail"


def test_dedup_key_invariances():
    base = key1("The café costs 12 dollars!")
    assert base == "the cafe costs 00 dollars"
    assert key1("THE CAFE costs 99 DOLLARS???") == base
    assert key1("the,cafe;costs(34)dollars") != base  # punct removal can join words
    assert key1("The café costs 00 dollars.") == base  # decomposed accent


def test_null_passthrough():
    s = pd.Series([None, "x"])
    assert _normalize(s)[0] is None
    assert _dedup_key(s)[0] is None


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_normalize_idempotent(s):
    once = norm1(s)
    assert norm1(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_dedup_key_idempotent_and_clean(s):
    k = key1(s)
    assert key1(k) == k
    assert all(c in "abcdefghijklmnopqrstuvwxyz0 " for c in k)


def test_spark_stage_is_arrow_batched(spark):
    df = spark.createDataFrame([("A “B”",), (None,)], ["text"])
    out = df.select(
        normalize_text_udf()(F.col("text")).alias("clean"),
        dedup_key_udf()(F.col("text")).alias("dkey"),
    )
    rows = out.collect()
    # the separator is an NBSP: normalize folds it to a space, the dedup
    # key drops it (only ASCII whitespace separates key words).
    assert rows[0].clean == 'A "B"'
    assert rows[0].dkey == "ab"
    assert rows[1].clean is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan

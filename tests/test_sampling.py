"""Deterministic sampling/splitting: reproducibility, rate accuracy, and
stability under repartitioning (the properties df.sample lacks)."""

import pytest

from wpextract_spark.operators.sampling import (
    _rate_to_hex,
    hash_split,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 4 = 0 THEN 'en' WHEN id % 4 = 1 THEN 'de' "
        "ELSE 'fr' END AS lang",
    )


def test_rate_to_hex_bounds():
    assert _rate_to_hex(1.0) == "g"
    assert _rate_to_hex(1.5) == "g"
    assert _rate_to_hex(0.0) == ""
    assert _rate_to_hex(-1) == ""
    assert _rate_to_hex(0.5) == "80000000"
    assert len(_rate_to_hex(0.123)) == 8


def test_stratified_rates_respected(spark):
    df = _docs(spark, 2000)
    out = stratified_sample(
        df, rates={"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert counts["en"] == 500          # rate 1.0 keeps every en row
    assert "de" not in counts           # rate 0.0 keeps none
    assert 400 < counts["fr"] < 600     # ~50% of 1000


def test_stratified_deterministic_and_partition_stable(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(df, default_rate=0.3).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(df.repartition(7), default_rate=0.3).collect()}
    assert a == b and a


def test_split_exhaustive_and_disjoint(spark):
    df = _docs(spark, 1000)
    out = hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == 1000
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 700


def test_split_head_frozen_when_tail_grows(spark):
    df = _docs(spark, 1000)
    v1 = {r["doc_id"]: r["split"] for r in
          hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    v2 = {r["doc_id"]: r["split"] for r in
          hash_split(df, weights={"train": 0.8, "val": 0.15, "test": 0.05}).collect()}
    # train unchanged; val only grows (at test's expense)
    assert {k for k, v in v1.items() if v == "train"} == {
        k for k, v in v2.items() if v == "train"}
    assert {k for k, v in v1.items() if v == "val"} <= {
        k for k, v in v2.items() if v == "val"}


def test_split_rejects_empty_weights(spark):
    with pytest.raises(ValueError):
        hash_split(_docs(spark), weights={})


def test_rate_to_hex_monotone_hypothesis():
    from hypothesis import given, strategies as st

    @given(st.floats(min_value=0, max_value=1), st.floats(min_value=0, max_value=1))
    def check(r1, r2):
        a, b = sorted([r1, r2])
        # monotone thresholds => monotone (nested) samples for free
        assert _rate_to_hex(a) <= _rate_to_hex(b)

    check()


def test_nested_rates_give_nested_samples(spark):
    df = _docs(spark, 500)
    keep = {}
    for rate in (0.2, 0.5, 0.8):
        keep[rate] = {
            r["doc_id"]
            for r in stratified_sample(df, rates={}, default_rate=rate).collect()
        }
    assert keep[0.2] <= keep[0.5] <= keep[0.8]
    assert len(keep[0.2]) < len(keep[0.8])


def test_source_mix_budgets(spark):
    from wpextract_spark.operators.sampling import source_mix

    rows = []
    for i in range(300):
        src = f"s{i % 3}"
        rows.append((i, src, "w " * (5 + i % 7)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = source_mix(
        docs, budgets={"s0": 300, "s1": 10**9, "s2": 0}, salt="mix"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # keep-all sentinel
    assert all(r["selected"] for r in by_src["s1"])
    assert by_src["s1"][0]["rate_key"] == "g"
    # zero budget drops everything
    assert not any(r["selected"] for r in by_src["s2"])
    # partial budget: selected word mass lands near the budget
    sel_words = sum(r["n_words"] for r in by_src["s0"] if r["selected"])
    total_words = sum(r["n_words"] for r in by_src["s0"])
    assert 0 < sel_words < total_words
    assert abs(sel_words - 300) < total_words * 0.25  # Bernoulli tolerance
    # every row kept in the output (audit-before-apply contract)
    assert len(out) == 300


def test_source_mix_default_budget_and_determinism(spark):
    from wpextract_spark.operators.sampling import source_mix

    docs = spark.createDataFrame(
        [(i, "other", "a b c d") for i in range(50)],
        "doc_id long, source string, text string",
    )
    a = source_mix(docs, budgets={}, default_budget=100, salt="mix").collect()
    b = source_mix(docs, budgets={}, default_budget=100, salt="mix").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # default None keeps everything
    c = source_mix(docs, budgets={}).collect()
    assert all(r["selected"] for r in c)


def test_source_mix_selection_is_repartition_stable(spark):
    from wpextract_spark.operators.sampling import source_mix

    docs = spark.createDataFrame(
        [(i, "s", "x " * 10) for i in range(200)],
        "doc_id long, source string, text string",
    )
    one = {
        r["doc_id"]: r["selected"]
        for r in source_mix(docs.coalesce(1), budgets={"s": 500}).collect()
    }
    many = {
        r["doc_id"]: r["selected"]
        for r in source_mix(docs.repartition(16), budgets={"s": 500}).collect()
    }
    assert one == many

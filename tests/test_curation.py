"""Curation pipeline: each stage must fire and attribute its reject."""

from wpextract_spark.operators.curation import curation_pipeline


def _sentence(i):
    return f"The quick brown fox number {i} jumps over the lazy sleeping dog."


def test_curation_verdicts_and_reasons(spark):
    good = "\n".join(_sentence(i) for i in range(6))  # 66 words, 6 kept lines
    short = "Too short."  # gopher: < 50 words
    # >= 50 words but no line ends with terminal punctuation -> c4
    no_punct = "\n".join(f"line {i} with five sturdy words trailing" for i in range(10))
    # same first-5-word prefix as doc 0's text -> exact_dup for the higher id
    exact_dup = good + "\nAn extra closing sentence changes the body text."
    # near-identical to good (one word changed at the front) -> near_dup,
    # but a different 5-word prefix so the exact stage doesn't claim it
    near_dup = good.replace("The quick", "A quick", 1)
    rows = [(0, good), (1, short), (2, no_punct), (3, exact_dup), (4, near_dup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in curation_pipeline(df).collect()
    }
    assert out[0] == (True, "")
    assert out[1] == (False, "gopher")
    assert out[2] == (False, "c4")
    assert out[3] == (False, "exact_dup")
    assert out[4] == (False, "near_dup")


def test_containment_stage_fires_and_attributes(spark):
    from wpextract_spark.operators.curation import (
        CURATION_STAGES,
        OPTIONAL_STAGES,
    )

    good = "\n".join(_sentence(i) for i in range(8))
    # a verbatim excerpt of `good` (its middle sentences): symmetric Jaccard
    # is low, directed containment ~1.0 — only the containment stage can
    # catch it. Long enough to clear gopher's minimum word count.
    quote = "\n".join(_sentence(i) for i in range(2, 7))
    other = "\n".join(
        f"Another topic sentence number {i} speaks about entirely new things."
        for i in range(6)
    )
    rows = [(0, good), (1, quote), (2, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # off by default: the quote passes (near-dup Jaccard stays below 0.05
    # threshold only if gram overlap is small — here containment is what
    # matters, so run without near_dup to isolate the behavior)
    base = {
        r["doc_id"]: (r["keep"], r["reject_reason"], r["containment_keep"])
        for r in curation_pipeline(
            df, stages=("gopher", "c4", "exact_dup")
        ).collect()
    }
    assert all(v[2] for v in base.values())  # flag present, all true

    # exact_dup excluded here: the quote shares the container's 5-word
    # prefix, and attribution is first-failing-stage in pipeline order —
    # this run isolates the containment verdict itself.
    withc = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in curation_pipeline(
            df, stages=("gopher", "c4", "containment")
        ).collect()
    }
    assert withc[0] == (True, "")  # the container survives
    assert withc[1] == (False, "containment")  # the quote is dropped
    assert withc[2] == (True, "")

    # directed: a doc whose gram set is a strict SUPERSET keeps, the pure
    # subset is the contained side regardless of id order
    superset = good + "\nAn entirely different closing line appears here."
    sup_rows = [(10, superset), (11, good)]
    sup = {
        r["doc_id"]: r["reject_reason"]
        for r in curation_pipeline(
            spark.createDataFrame(sup_rows, "doc_id long, text string"),
            stages=("containment",),
        ).collect()
    }
    assert sup[10] == "" and sup[11] == "containment"

    # mutual containment (identical texts => identical gram sets, both
    # directions 1.0): the smaller id survives, matching exact_dup's
    # min-id convention
    twins = spark.createDataFrame(
        [(10, good), (11, good)], "doc_id long, text string"
    )
    tw = {
        r["doc_id"]: r["reject_reason"]
        for r in curation_pipeline(twins, stages=("containment",)).collect()
    }
    assert tw[10] == "" and tw[11] == "containment"

    # unknown stage still rejected
    import pytest

    with pytest.raises(ValueError):
        curation_pipeline(df, stages=("gopher", "bogus"))
    assert "containment" in OPTIONAL_STAGES
    assert "containment" not in CURATION_STAGES

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

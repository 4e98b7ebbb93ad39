"""Incremental recrawl: equivalence with full re-extraction, kernel savings."""

import pytest
from pyspark.sql import functions as F

from wpextract_spark.plans.incremental import (
    extract_pages,
    incremental_update,
    update_metrics,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


def _crawls(spark):
    run1 = _pages(
        spark,
        [(f"u{i}", f"<p>body {i}</p>") for i in range(1, 7)],
    )
    run2 = _pages(
        spark,
        # u1 removed; u2 changed; u3-u6 unchanged; u7 added.
        [("u2", "<p>body 2 EDITED</p>")]
        + [(f"u{i}", f"<p>body {i}</p>") for i in range(3, 7)]
        + [("u7", "<p>body 7</p>")],
    )
    return run1, run2


def test_incremental_equals_full_rebuild(spark):
    run1, run2 = _crawls(spark)
    full = {(r.url, r.page_fp, r.text) for r in extract_pages(run2).collect()}
    corpus, _ = incremental_update(extract_pages(run1), run2)
    incr = {(r.url, r.page_fp, r.text) for r in corpus.collect()}
    assert incr == full


def test_kernel_runs_only_on_stale_pages(spark):
    run1, run2 = _crawls(spark)
    seen: list[str] = []

    def counting_extract(pages):
        seen.extend(r.url for r in pages.select("url").collect())
        return extract_pages(pages)

    corpus, diff = incremental_update(
        extract_pages(run1), run2, extract=counting_extract
    )
    corpus.count()  # materialize
    assert sorted(seen) == ["u2", "u7"]  # changed + added ONLY


def test_diff_statuses_and_metrics(spark):
    run1, run2 = _crawls(spark)
    _, diff = incremental_update(extract_pages(run1), run2)
    by_url = {r.url: r.status for r in diff.collect()}
    assert by_url["u1"] == "removed"
    assert by_url["u2"] == "changed"
    assert by_url["u3"] == "unchanged"
    assert by_url["u7"] == "added"
    metrics = update_metrics(diff)
    assert metrics["extracted"] == 2
    assert metrics["carried"] == 4
    assert metrics["by_status"]["removed"] == 1
    assert metrics["kernel_savings"] == pytest.approx(4 / 6)


def test_carried_text_is_previous_runs_output(spark):
    # Carried rows must be the stored text, not a re-extraction: feed a
    # prev corpus whose text was post-processed after extraction.
    run1, run2 = _crawls(spark)
    prev = extract_pages(run1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" [annotated]"))
    )
    corpus, _ = incremental_update(prev, run2)
    got = {r.url: r.text for r in corpus.collect()}
    assert got["u3"] == "body 3 [annotated]"  # carried verbatim
    assert got["u2"] == "body 2 EDITED"  # freshly extracted


def test_second_refresh_with_same_crawl_is_a_noop(spark):
    run1, run2 = _crawls(spark)
    corpus1, _ = incremental_update(extract_pages(run1), run2)
    seen: list[str] = []

    def counting_extract(pages):
        seen.extend(r.url for r in pages.select("url").collect())
        return extract_pages(pages)

    corpus2, diff = incremental_update(corpus1, run2, extract=counting_extract)
    assert {r.status for r in diff.collect()} == {"unchanged"}
    assert seen == []  # the kernel never ran
    assert {(r.url, r.text) for r in corpus2.collect()} == {
        (r.url, r.text) for r in corpus1.collect()
    }

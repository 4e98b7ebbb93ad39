"""Checkpoint-resume protocol: a job interrupted mid-run resumes with no
repeated or lost work, and the per-partition lineage totals agree exactly
with the committed output (reference analog: crawl cache reuse,
``tests/scrape/test_crawler.py:20-79``)."""

from pyspark.sql import functions as F

from wpextract_spark.plans.job import ResumableExtractJob
from wpextract_spark.sources.synth import generate_pages

N_PAGES = 120
N_CHUNKS = 4


def test_resume_after_interrupt(spark, tmp_path):
    pages = generate_pages(spark, n_pages=N_PAGES, seed=7)
    out = tmp_path / "job_out"

    first = ResumableExtractJob(spark, pages, out, n_chunks=N_CHUNKS)
    partial = first.run(max_chunks=2)  # "crash" after two chunks
    assert sum(not r.skipped for r in partial) == 2
    assert len(first.completed_chunks()) == 2

    second = ResumableExtractJob(spark, pages, out, n_chunks=N_CHUNKS)
    final = second.run(resume=True)
    assert [r.chunk for r in final] == list(range(N_CHUNKS))
    assert sum(r.skipped for r in final) == 2  # completed chunks not re-run

    result = second.output()
    assert result.count() == N_PAGES
    assert result.select("url").distinct().count() == N_PAGES  # no url twice

    # Lineage totals agree exactly with the committed output.
    m = second.metrics()
    assert m.agg(F.sum("n_docs")).first()[0] == N_PAGES
    n_bytes_out = m.agg(F.sum("n_bytes_out")).first()[0]
    assert (
        result.agg(F.sum(F.octet_length("content.text"))).first()[0] == n_bytes_out
    )
    # Per-partition granularity: more lineage rows than chunks.
    assert m.count() > N_CHUNKS


def test_no_resume_reruns_everything(spark, tmp_path):
    pages = generate_pages(spark, n_pages=40, seed=9)
    out = tmp_path / "job_out"
    job = ResumableExtractJob(spark, pages, out, n_chunks=2)
    job.run()
    rerun = ResumableExtractJob(spark, pages, out, n_chunks=2)
    results = rerun.run(resume=False)
    assert all(not r.skipped for r in results)
    assert rerun.output().count() == 40  # overwrite, not append


def test_extraction_matches_direct_kernel(spark, tmp_path):
    from wpextract_spark.operators.extract import content_extract_udf

    pages = generate_pages(spark, n_pages=30, seed=11)
    job = ResumableExtractJob(spark, pages, tmp_path / "o", n_chunks=2)
    job.run()
    via_job = {
        r["url"]: r["text"]
        for r in job.output().select("url", "content.text").collect()
    }
    res = content_extract_udf()(F.col("html"), F.col("url"))
    direct = {
        r["url"]: r["text"]
        for r in pages.select("url", res["text"].alias("text")).collect()
    }
    assert via_job == direct


def test_pathological_doc_quarantined(spark, tmp_path):
    """A document whose extraction raises must fail alone (error column),
    never the task; lineage counts it."""
    from pyspark.sql import functions as F

    good = generate_pages(spark, n_pages=10, seed=13)
    # Deep nesting blows the recursive text walk's Python recursion limit.
    bomb = ("<div>" * 20000) + "boom" + ("</div>" * 20000)
    bad = spark.createDataFrame(
        [("https://bad.example.org/x/", None, bomb.encode(), "x", "en")],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    job = ResumableExtractJob(spark, good.unionByName(bad), tmp_path / "q", n_chunks=1)
    results = job.run()
    out = job.output()
    assert out.count() == 11
    errs = out.where(F.col("content.error").isNotNull())
    assert errs.count() == 1
    assert errs.first()["url"] == "https://bad.example.org/x/"
    m = job.metrics()
    assert m.agg(F.sum("n_errors")).first()[0] == 1
    # the ten good docs extracted normally
    assert out.where(F.col("content.text").isNotNull()).count() == 10


def test_empty_chunk_commits_and_resume_skips_it(spark, tmp_path):
    """A chunk that selects zero pages still writes a commit row, so resume
    never re-runs it."""
    from wpextract_spark.plans.job import ResumableExtractJob
    from wpextract_spark.sources.synth import generate_pages

    # 1 page, many chunks: most chunks are empty.
    pages = generate_pages(spark, n_pages=1, seed=9, partitions=1)
    job = ResumableExtractJob(spark, pages, str(tmp_path / "out"), n_chunks=4,
                              partitions_per_chunk=1)
    first = job.run()
    assert len(first) == 4 and not any(r.skipped for r in first)
    assert job.completed_chunks() == {0, 1, 2, 3}
    second = job.run(resume=True)
    assert all(r.skipped for r in second)
    # output keeps only corpus columns (no chunk partition-discovery column)
    assert "chunk" not in job.output().columns
    assert job.output().count() == 1

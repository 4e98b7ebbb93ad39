"""Streaming extraction: identical kernel results to batch, checkpointed
file-source progress (no file processed twice across restarts)."""

from pyspark.sql import functions as F

from wpextract_spark.operators.extract import content_extract_udf
from wpextract_spark.sources.synth import generate_pages
from wpextract_spark.streaming.extract_stream import run_file_stream


def _write_batch(spark, tmp_path, n, seed, name):
    pages = generate_pages(spark, n_pages=n, seed=seed, partitions=2)
    pages.write.mode("append").parquet(str(tmp_path / "in"))
    return pages


def _drain_stateful(spark, query, out_dir, expected_rows, timeout_s=120):
    """Wait until a stateful availableNow query has committed
    ``expected_rows`` output rows, then stop it.

    availableNow + ProcessingTimeTimeout never self-terminates (the engine
    keeps the trigger alive to fire future state timeouts), so tests poll the
    sink for the expected row count instead of awaitTermination."""
    import time

    deadline = time.time() + timeout_s
    count = -1
    while time.time() < deadline:
        try:
            count = spark.read.parquet(str(out_dir)).count()
        except Exception:
            count = -1
        if count >= expected_rows:
            break
        time.sleep(1.0)
    query.stop()
    assert count >= expected_rows, f"sink stuck at {count} < {expected_rows}"


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    pages = _write_batch(spark, tmp_path, 60, seed=3, name="a")

    q, _ = run_file_stream(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 60

    # Byte-identical to the batch kernel per url.
    res = content_extract_udf()(F.col("html"), F.col("url"))
    batch = {r["url"]: r["t"] for r in pages.select("url", res["text"].alias("t")).collect()}
    stream = {r["url"]: r["text"] for r in out.select("url", "content.text").collect()}
    assert stream == batch

    # New files appear; restart drains ONLY them (checkpointed progress).
    generate_pages(spark, n_pages=25, seed=99, partitions=1).write.mode("append").parquet(
        str(tmp_path / "in")
    )
    q2, _ = run_file_stream(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert out2.count() == 85  # 60 + 25, nothing re-processed
    assert out2.select("url").distinct().count() == 85


def test_windowed_metrics_batch_semantics(spark):
    from wpextract_spark.streaming.extract_stream import (
        extract_pages_stream,
        windowed_ingest_metrics,
    )

    pages = generate_pages(spark, n_pages=80, seed=11, partitions=2)
    m = windowed_ingest_metrics(extract_pages_stream(pages), window="1 day")
    rows = m.collect()
    assert sum(r["n_docs"] for r in rows) == 80
    assert all(r["bytes_in"] > 0 and r["bytes_out"] > 0 for r in rows)
    # windows are day-aligned and non-overlapping
    starts = [r["window_start"] for r in rows]
    assert len(set(starts)) == len(starts)


def test_stateful_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: across micro-batches, each content hash
    survives exactly once — the first batch's copy wins, later duplicates are
    suppressed by the state store."""
    from pyspark.sql import functions as F
    from wpextract_spark.sources.synth import PAGES_SCHEMA
    from wpextract_spark.streaming.dedup_stream import first_seen_batch, first_seen_stream

    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    batch1 = generate_pages(spark, n_pages=30, seed=21, partitions=1)
    batch1.write.mode("append").parquet(str(in_dir))

    def drain(expected_rows):
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(in_dir))
        q = (
            first_seen_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain_stateful(spark, q, out_dir, expected_rows)

    n1 = batch1.select(F.md5("text")).distinct().count()
    drain(n1)
    out1 = spark.read.parquet(str(out_dir))
    assert out1.count() == n1  # one survivor per distinct content hash

    # Second batch: exact duplicates (same text, new urls) + fresh docs.
    dup = batch1.withColumn("url", F.concat(F.col("url"), F.lit("copy/")))
    new = generate_pages(spark, n_pages=10, seed=77, partitions=1)
    dup.unionByName(new).write.mode("append").parquet(str(in_dir))
    n_total_expected = batch1.unionByName(new).select(F.md5("text")).distinct().count()
    drain(n_total_expected)

    n_total = (
        batch1.unionByName(new).select(F.md5("text")).distinct().count()
    )
    out2 = spark.read.parquet(str(out_dir))
    assert out2.count() == n_total  # every duplicate suppressed by state
    assert out2.where(F.col("url").endswith("copy/")).count() == 0

    # Batch reference semantics agree with the streamed result set.
    ref = first_seen_batch(batch1.unionByName(dup).unionByName(new))
    assert ref.count() == n_total


def test_stateful_domain_stats(spark, tmp_path):
    """applyInPandasWithState running aggregates: totals accumulate across
    micro-batches per domain and match the batch groupBy on the full input."""
    from pyspark.sql import functions as F
    from wpextract_spark.sources.synth import PAGES_SCHEMA
    from wpextract_spark.streaming.domain_stats import (
        domain_stats_batch,
        domain_stats_stream,
    )

    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    batch1 = generate_pages(spark, n_pages=40, seed=5, partitions=1)
    batch1.write.mode("append").parquet(str(in_dir))

    def drain(expected_rows):
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(in_dir))
        q = (
            domain_stats_stream(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain_stateful(spark, q, out_dir, expected_rows)

    d1 = batch1.select(F.regexp_extract("url", r"^https?://([^/]+)", 1)).distinct().count()
    drain(d1)
    batch2 = generate_pages(spark, n_pages=60, seed=5, partitions=1).where(
        F.xxhash64("url") % 2 == 0
    )
    batch2.write.mode("append").parquet(str(in_dir))
    d2 = batch2.select(F.regexp_extract("url", r"^https?://([^/]+)", 1)).distinct().count()
    drain(d1 + d2)

    # Last emission per domain == batch totals over everything ingested.
    out = spark.read.parquet(str(out_dir))
    from pyspark.sql import Window
    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("domain").orderBy(F.desc("n_docs"))
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    ref = domain_stats_batch(batch1.unionByName(batch2))
    got = {r["domain"]: r for r in latest.collect()}
    for r in ref.collect():
        g = got[r["domain"]]
        assert (g["n_docs"], g["total_chars"]) == (r["n_docs"], r["total_chars"]), r["domain"]
        assert (g["first_ts"], g["last_ts"]) == (r["first_ts"], r["last_ts"])
    assert set(got) == {r["domain"] for r in ref.collect()}


def test_backfill_metrics_are_exact(spark, tmp_path):
    """availableNow backfill metrics must cover EVERY window (append-mode
    streaming would silently drop the watermark tail) and match the batch
    windowed aggregation exactly."""
    from wpextract_spark.streaming.extract_stream import (
        extract_pages_stream,
        run_file_stream,
        windowed_ingest_metrics,
    )

    pages = _write_batch(spark, tmp_path, 50, seed=13, name="a")
    q, mq = run_file_stream(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
        metrics_dir=str(tmp_path / "metrics"),
    )
    assert mq is None  # backfill mode: metrics computed exactly, no 2nd query
    got = spark.read.parquet(str(tmp_path / "metrics"))
    assert got.agg({"n_docs": "sum"}).first()[0] == 50
    ref = windowed_ingest_metrics(extract_pages_stream(pages))
    assert got.count() == ref.count()  # every window present, incl. the tail


def test_round4_kernel_stages_compose_in_streaming(spark, tmp_path):
    """The new stateless kernel stages (mojibake repair, Unicode
    canonicalization, markdown rendering, JSON-LD) are plain projections,
    so a readStream pipeline over them must equal the batch result on the
    same files — no rewrite, no state."""
    from wpextract_spark.operators.encoding import fix_mojibake_udf
    from wpextract_spark.operators.extract import jsonld_udf, markdown_udf
    from wpextract_spark.operators.textnorm import normalize_text_udf

    rows = [
        (1, "cafÃ©  twice", "<h1>T</h1><p>b</p>"),
        (2, "plain “q”", "<ul><li>i</li></ul>"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, html string")
    df.write.mode("overwrite").parquet(str(tmp_path / "sin"))

    def stages(frame):
        fixed = fix_mojibake_udf()(F.col("text"))
        return frame.select(
            "id",
            normalize_text_udf()(fixed["fixed"]).alias("clean"),
            markdown_udf()(F.col("html")).alias("md"),
            jsonld_udf()(F.col("html"))["n_objects"].alias("n_ld"),
        )

    batch = {r.id: r for r in stages(spark.read.parquet(str(tmp_path / "sin"))).collect()}
    stream_in = spark.readStream.schema("id long, text string, html string").parquet(
        str(tmp_path / "sin")
    )
    q = (
        stages(stream_in)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sout"))
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id: r for r in spark.read.parquet(str(tmp_path / "sout")).collect()}
    assert got.keys() == batch.keys()
    for key in got:
        assert got[key] == batch[key]
    assert got[1].clean == "café twice"  # repaired, then ws-collapsed
    assert got[2].clean == 'plain "q"'  # curly quotes folded
    assert got[2].md == "- i"

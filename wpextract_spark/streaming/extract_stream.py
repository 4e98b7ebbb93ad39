"""Structured Streaming surface for the extraction kernel.

The reference is batch-only (SURVEY.md §2.5: no streaming operators), but a
Common-Crawl-style corpus arrives continuously; the kernel is stateless per
document, so the identical fused UDF runs unchanged under ``readStream`` —
one code path for batch and streaming (the Dataset API guarantee).

Pieces:
* :func:`extract_pages_stream` — kernel over a streaming pages DataFrame;
* :func:`windowed_ingest_metrics` — event-time doc/byte counters per
  ``warc_ts`` window with a watermark bounding late-data state (the
  streaming analog of the batch job's lineage table);
* :func:`run_file_stream` — directory-watching pipeline: new parquet files
  of pages appear -> extracted parquet + per-window metrics leave, with
  checkpointing for exactly-once file-source progress.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wpextract_spark.operators.extract import content_extract_udf
from wpextract_spark.sources.synth import PAGES_SCHEMA


def extract_pages_stream(pages: DataFrame) -> DataFrame:
    """Fused extraction over a (streaming or batch) pages DataFrame.

    Output: url, warc_ts, lang, content struct (text + span arrays), byte
    counters. Stateless — no shuffle, no state store; each micro-batch is a
    narrow Arrow-batched pass exactly like the batch plan.
    """
    res = content_extract_udf()(F.col("html"), F.col("url"))
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        F.octet_length("html").alias("bytes_in"),
        res.alias("content"),
    ).withColumn("bytes_out", F.octet_length("content.text"))


def windowed_ingest_metrics(
    extracted: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time rollup: docs/bytes per ``warc_ts`` window.

    The watermark bounds how late a page may arrive before its window's
    state is finalized and dropped — state size stays O(windows in the
    watermark horizon), not O(stream length).
    """
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "bytes_in",
            "bytes_out",
        )
    )


def run_file_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    metrics_dir: Optional[str] = None,
):
    """Watch ``input_dir`` for pages parquet files, write extracted parquet.

    ``available_now=True`` drains everything currently present and stops
    (the test/backfill mode); ``False`` runs continuously. The checkpoint
    directory gives exactly-once file-source progress across restarts — the
    streaming analog of ``ResumableExtractJob``'s chunk metrics.

    Metrics: in continuous mode a second streaming sink writes watermark-
    closed windows (append mode — windows newer than max event time minus
    the watermark stay in state until later data closes them). In
    availableNow backfill mode that would silently drop every tail window,
    so the metrics are instead computed EXACTLY with one batch windowed
    aggregation over the drained output after the stream finishes.

    Returns ``(query, metrics_query)`` — ``metrics_query`` is the second
    StreamingQuery handle (continuous mode with ``metrics_dir``) or None,
    so callers can await/stop it rather than leaking a running query.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    extracted = extract_pages_stream(pages)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    metrics_query = None
    if metrics_dir is not None:
        if available_now:
            query.awaitTermination()
            out = spark.read.parquet(output_dir)
            windowed_ingest_metrics(out).write.mode("overwrite").parquet(metrics_dir)
        else:
            m = windowed_ingest_metrics(extract_pages_stream(
                spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
            ))
            metrics_query = (
                m.writeStream.format("parquet")
                .option("path", metrics_dir)
                .option("checkpointLocation", checkpoint_dir + "_metrics")
                .outputMode("append")
                .start()
            )
    return query, metrics_query

"""Checkpoint-resumable bulk extraction job with per-partition lineage.

North-rule requirements (BASELINE.json): the 10^12-row extraction must be
"resumable from checkpoint with per-partition lineage + metrics". The
reference's analog is the crawl cache (``scrape/crawler.py:11, 50-77`` —
a versioned ``url_cache.json`` that lets a rerun skip completed work); at
Spark scale that becomes a chunked job over the pages table:

- The input is split into ``n_chunks`` deterministic chunks by
  ``pmod(xxhash64(url), n_chunks)`` — the same explicit url-hash partitioning
  the parse stage uses, so chunk membership is stable across runs, executor
  counts, and input orderings.
- Each chunk is extracted and written to ``out/chunk=<i>/`` (dynamic partition
  overwrite — a re-run of a half-written chunk replaces it cleanly), then a
  lineage row per *Spark partition* of the chunk is appended to the metrics
  table: ``(chunk, partition_id, n_docs, n_bytes_in, n_bytes_out, wall_s,
  run_id)``. The metrics append is the commit point: a chunk is complete iff
  it has metrics rows, so a crash between data write and metrics append is
  repaired by re-running the chunk (idempotent overwrite).
- ``run(resume=True)`` reads the metrics table and skips completed chunks —
  exact checkpoint resume at chunk granularity with no url ever extracted
  into the output twice.

On a real deployment both tables would be Iceberg (atomic append = the commit
point); the sandbox uses parquet directories with the same layout and an
append-only metrics dir, which preserves the protocol.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wpextract_spark.operators.extract import content_extract_udf

METRICS_SCHEMA = (
    "chunk INT, partition_id INT, n_docs BIGINT, n_errors BIGINT, "
    "n_bytes_in BIGINT, n_bytes_out BIGINT, wall_s DOUBLE, run_id STRING"
)


@dataclass
class ChunkResult:
    chunk: int
    n_docs: int
    n_bytes_in: int
    n_bytes_out: int
    wall_s: float
    skipped: bool = False


class ResumableExtractJob:
    """Bulk fused extraction of a pages table, chunked for exact resume.

    Parameters
    ----------
    pages : DataFrame with at least (url, html) — the input_hint table shape.
    out_dir : output root; results land in ``out_dir/data/chunk=<i>/``.
    n_chunks : resume granularity. At 10^12 rows this would be 10k-100k so a
        lost cluster forfeits at most minutes of work; tests use small values.
    """

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        out_dir: str | Path,
        n_chunks: int = 8,
        partitions_per_chunk: Optional[int] = None,
    ) -> None:
        self.spark = spark
        self.pages = pages
        self.out_dir = Path(out_dir)
        self.n_chunks = n_chunks
        self.partitions_per_chunk = (
            partitions_per_chunk or spark.sparkContext.defaultParallelism
        )
        self.data_dir = self.out_dir / "data"
        self.metrics_dir = self.out_dir / "metrics"
        self.run_id = uuid.uuid4().hex[:12]

    # -- metrics table ------------------------------------------------------

    def metrics(self) -> DataFrame:
        """All lineage rows written so far (empty DataFrame if none)."""
        path = str(self.metrics_dir)
        if not any(self.metrics_dir.glob("*/*.parquet")):
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.read.schema(METRICS_SCHEMA).parquet(f"{path}/*")

    def completed_chunks(self) -> set[int]:
        if not self.metrics_dir.exists():
            return set()
        rows = self.metrics().select("chunk").distinct().collect()
        return {r["chunk"] for r in rows}

    # -- chunk execution ----------------------------------------------------

    def _chunk_df(self, chunk: int) -> DataFrame:
        return self.pages.where(
            F.pmod(F.xxhash64("url"), F.lit(self.n_chunks)) == chunk
        )

    def _run_chunk(self, chunk: int) -> ChunkResult:
        t0 = time.perf_counter()
        df = self._chunk_df(chunk).repartition(
            self.partitions_per_chunk, F.xxhash64("url")
        )
        res = content_extract_udf()(F.col("html"), F.col("url"))
        extracted = df.select(
            "url",
            F.octet_length("html").alias("_bytes_in"),
            res.alias("content"),
            F.spark_partition_id().alias("partition_id"),
        )
        chunk_dir = self.data_dir / f"chunk={chunk}"
        extracted.write.mode("overwrite").parquet(str(chunk_dir))

        # Exact per-partition doc/byte lineage from the written data itself
        # (counters derived from the committed output, not from accumulators,
        # so retried/speculative tasks can never double-count).
        wall_s = time.perf_counter() - t0
        written = self.spark.read.parquet(str(chunk_dir))
        lineage = written.groupBy("partition_id").agg(
            F.count("*").alias("n_docs"),
            F.count("content.error").alias("n_errors"),
            F.sum("_bytes_in").alias("n_bytes_in"),
            F.sum(F.octet_length("content.text")).alias("n_bytes_out"),
        )
        lineage = lineage.select(
            F.lit(chunk).cast("int").alias("chunk"),
            F.col("partition_id").cast("int"),
            "n_docs",
            "n_errors",
            "n_bytes_in",
            "n_bytes_out",
            F.lit(wall_s).alias("wall_s"),
            F.lit(self.run_id).alias("run_id"),
        )
        if lineage.isEmpty():
            # A chunk that selected zero pages still needs a commit row —
            # "complete iff it has metrics rows" would otherwise re-run the
            # empty chunk on every resume, forever.
            lineage = self.spark.createDataFrame(
                [(chunk, -1, 0, 0, 0, 0, wall_s, self.run_id)], METRICS_SCHEMA
            )
        # Append-only commit marker: one sub-directory per (run, chunk) so
        # concurrent metric writes never clobber each other.
        lineage.coalesce(1).write.mode("overwrite").parquet(
            str(self.metrics_dir / f"{self.run_id}-{chunk:06d}")
        )
        totals = lineage.agg(
            F.sum("n_docs"), F.sum("n_bytes_in"), F.sum("n_bytes_out")
        ).first()
        return ChunkResult(
            chunk,
            totals[0] or 0,
            totals[1] or 0,
            totals[2] or 0,
            round(wall_s, 3),
        )

    # -- driver -------------------------------------------------------------

    def run(
        self, resume: bool = True, max_chunks: Optional[int] = None
    ) -> list[ChunkResult]:
        """Execute all (remaining) chunks; ``max_chunks`` bounds this call so
        tests can simulate a mid-job crash."""
        done = self.completed_chunks() if resume else set()
        results: list[ChunkResult] = []
        executed = 0
        for chunk in range(self.n_chunks):
            if chunk in done:
                results.append(ChunkResult(chunk, 0, 0, 0, 0.0, skipped=True))
                continue
            if max_chunks is not None and executed >= max_chunks:
                break
            results.append(self._run_chunk(chunk))
            executed += 1
        return results

    def output(self) -> DataFrame:
        """The extracted corpus written so far (url, content) — internal
        bookkeeping columns and the chunk partition-discovery column are
        dropped."""
        return self.spark.read.parquet(str(self.data_dir)).drop(
            "partition_id", "_bytes_in", "chunk"
        )

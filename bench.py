#!/usr/bin/env python
"""Headline benchmark for the wpextract_spark engine.

Runs every registered query from ``wpextract_spark.plans.queries`` against the
parquet tables at ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` (default all cores) and, in addition, times the
flagship fused-extraction kernel over a deterministic synthetic pages table to
report an extraction docs/sec throughput (the BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extract_docs_per_sec": ...}

Each query is forced end-to-end with a ``noop``-format write (full computation,
no driver-side collect). Scaling evidence (local[8] vs local[32]) lives in
``scripts/scaling_bench.py`` -> ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Pages synthesized for the extraction-throughput probe (deterministic).
# 60k pages: at ~35k docs/s on 32 cores the probe runs ~2s of steady-state
# work, so fixed stage costs no longer dominate the reported docs/sec (at 8k
# they swamped it ~6x).
N_BENCH_PAGES = int(os.environ.get("BENCH_PAGES", "60000"))


def _force(df) -> int:
    """Run the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from wpextract_spark.plans.queries import QUERIES
    from wpextract_spark.session import get_session
    from wpextract_spark.operators.extract import content_extract_udf
    from wpextract_spark.sources.synth import generate_pages

    from pyspark.sql import functions as F

    spark = get_session("wpextract-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    # Warm the JVM, Arrow path, AND the Python-worker pool so query timings
    # measure the plan, not first-call setup. A plan with two chained Python
    # stages needs 2 workers per task slot (separate runner per stage), so the
    # warmup chains mapInPandas -> pandas_udf to fill the pool to that depth;
    # with spark.python.worker.reuse the timed queries then find warm workers.
    def _ident(batches):
        for b in batches:
            yield b

    _warm = F.pandas_udf(lambda v: v * 1.0, "double")

    par = spark.sparkContext.defaultParallelism
    warm = spark.range(par * 4, numPartitions=par).mapInPandas(_ident, "id long")
    _force(warm.select(_warm(F.col("id").cast("double")).alias("x")))

    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    # Flagship extraction throughput — SAME protocol as scripts/
    # scaling_worker.py so this headline and BENCH/BASELINE.md agree within
    # noise: pages pre-written to a 256-file parquet, scan tasks packed to
    # ~8 waves per slot, scan -> fused UDF -> noop sink (no shuffle), one
    # warm-up pass, best of 3 timed trials.
    import tempfile

    cores = spark.sparkContext.defaultParallelism
    with tempfile.TemporaryDirectory(prefix="bench_pages_") as tmp:
        input_path = f"{tmp}/pages.parquet"
        generate_pages(spark, n_pages=N_BENCH_PAGES, seed=42, partitions=256).write.parquet(
            input_path
        )
        total_bytes = sum(
            f.stat().st_size for f in Path(input_path).glob("*.parquet")
        )
        max_part = max(1_000_000, total_bytes // (cores * 8))
        prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        prev_ocb = spark.conf.get("spark.sql.files.openCostInBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_part))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        try:
            pages = spark.read.parquet(input_path)
            n = pages.count()
            res = content_extract_udf()(F.col("html"), F.col("url"))
            extracted = pages.select(
                "url",
                res["text"].alias("text"),
                F.size(res["links_internal"]).alias("n_int"),
                F.size(res["images"]).alias("n_img"),
            )
            _force(extracted)  # warm-up: workers, plan, page cache
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                _force(extracted)
                walls.append(time.perf_counter() - t0)
            dt_extract = min(walls)
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
            spark.conf.set("spark.sql.files.openCostInBytes", prev_ocb)
    timings["extract_throughput"] = round(dt_extract, 3)
    total += dt_extract

    result = {
        "metric": "wpextract_spark headline suite wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extract_docs_per_sec": round(n / dt_extract, 1),
        "extract_pages": n,
        "cores": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

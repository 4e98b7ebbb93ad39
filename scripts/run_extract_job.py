#!/usr/bin/env python
"""spark-submit entry point for the bulk extraction job.

Cluster usage (north-star deployment shape)::

    python scripts/make_pyfiles.py dist/wpextract_spark.zip
    spark-submit --py-files dist/wpextract_spark.zip \
        --conf spark.executorEnv.PYTHONPATH=dist/wpextract_spark.zip \
        --conf spark.python.daemon.module=wpextract_spark.pywarm_daemon \
        scripts/run_extract_job.py --input <pages_table> --output <out_dir> \
        [--chunks 64] [--no-resume] [--synth N]

The two extra confs enable the pre-warming worker daemon (~6x lower per-task
overhead, see wpextract_spark/pywarm_daemon.py). The daemon process spawns
BEFORE --py-files reach worker sys.path, so the zip must also be on the
executors' PYTHONPATH (executorEnv conf above, with a path valid on every
node — or install the package on the nodes). Omit both confs to run with the
stock daemon; everything still works, each task just pays the zipimport
rescan.

Local smoke: ``--synth 500`` generates the deterministic synthetic pages
table instead of reading ``--input``.

Reads pages(url, warc_ts, html, text, lang), runs the fused extraction kernel
chunk-by-chunk with per-partition lineage + metrics and checkpoint resume
(wpextract_spark/plans/job.py), and prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet)")
    ap.add_argument("--output", required=True, help="output root (data/ + metrics/)")
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--synth", type=int, default=0, help="generate N synthetic pages instead of --input")
    args = ap.parse_args()

    # Imports deferred until after spark-submit has set up the py-files path.
    from pyspark.sql import SparkSession

    from wpextract_spark.plans.job import ResumableExtractJob
    from wpextract_spark.sources.synth import generate_pages

    spark = SparkSession.builder.appName("wpextract-bulk-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synth:
        pages = generate_pages(spark, n_pages=args.synth, seed=42)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("either --input or --synth is required")

    job = ResumableExtractJob(spark, pages, args.output, n_chunks=args.chunks)
    results = job.run(resume=not args.no_resume)
    print(
        json.dumps(
            {
                "chunks_total": args.chunks,
                "chunks_run": sum(not r.skipped for r in results),
                "chunks_skipped": sum(r.skipped for r in results),
                "docs": sum(r.n_docs for r in results),
                "bytes_in": sum(r.n_bytes_in for r in results),
                "bytes_out": sum(r.n_bytes_out for r in results),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

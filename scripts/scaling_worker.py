#!/usr/bin/env python
"""One scaling-bench measurement: fused extraction throughput at a given
core count over a pre-generated pages parquet. Prints one JSON line.

Usage: python scripts/scaling_worker.py <cores> <input_parquet> [trials]

Run in its own process per core count — Spark local-mode parallelism is fixed
at JVM start, so N-vs-4N evidence (north_rule two-cluster-size criterion)
needs one JVM per level.

The timed job is scan -> fused extraction UDF -> noop sink, with NO shuffle:
the parquet scan splits by file (64 uniform files), so the plan and the work
per partition are identical at every parallelism level and only the number of
concurrent task slots changes — exactly how a cluster resize behaves.
(Measured here, an explicit repartition before the parse stage costs as much
JVM CPU as extraction itself; the pipeline reserves url-hash repartition for
the chunked resume protocol where chunk membership must be input-stable, see
wpextract_spark/plans/job.py.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    cores = int(sys.argv[1])
    input_path = sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from wpextract_spark.operators.extract import content_extract_udf
    from wpextract_spark.session import default_builder

    spark = (
        default_builder("scaling-bench", master=f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(input_path)
    n = pages.count()

    res = content_extract_udf()(F.col("html"), F.col("url"))
    extracted = pages.select(
        "url",
        res["text"].alias("text"),
        F.size(res["links_internal"]).alias("n_int"),
        F.size(res["images"]).alias("n_img"),
    )

    # Warm-up pass: spawns the Python workers, compiles the plan, faults the
    # input into the page cache — identical treatment at every core count.
    extracted.write.format("noop").mode("overwrite").save()

    walls = []
    for _ in range(trials):
        t0 = time.perf_counter()
        extracted.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n,
                "wall_s": round(wall, 3),
                "walls": [round(w, 3) for w in walls],
                "docs_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

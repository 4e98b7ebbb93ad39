"""End-to-end corpus build: ledger consistency, artifact layout, and the
decontamination guarantee."""

import json
import os

from pyspark.sql import functions as F

from wpextract_spark.plans.corpus_build import build_training_corpus
from wpextract_spark.sources.synth import generate_pages


def test_full_build_ledger_and_artifacts(spark, tmp_path):
    pages = generate_pages(spark, n_pages=120, seed=11, partitions=2)
    out = str(tmp_path / "corpus")
    m = build_training_corpus(
        spark,
        pages,
        out,
        seq_len=64,
        seqs_per_shard=8,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        # C4's terminal-punctuation rule rejects the whole synthetic corpus
        # (its lines are word soup) — exactly the per-corpus tuning the
        # stages knob exists for.
        curation_stages=("gopher", "exact_dup", "near_dup"),
    )
    st = m["stages"]
    assert st["extract"]["in"] == 120
    assert st["extract"]["out"] <= 120
    # curation ledger adds up: kept + all rejects == input
    cur = st["curate"]
    assert cur["out"] + sum(cur["rejects_by_reason"].values()) == cur["in"]
    # split covers the curated set exactly
    assert sum(st["split"].values()) == cur["out"]
    # artifacts on disk
    assert os.path.exists(os.path.join(out, "metrics.json"))
    with open(os.path.join(out, "metrics.json")) as fh:
        assert json.load(fh)["stages"]["extract"]["in"] == 120
    shards = spark.read.parquet(os.path.join(out, "train_shards"))
    assert shards.count() == st["pack"]["n_sequences"]
    assert st["pack"]["n_tokens"] == (
        shards.agg(F.sum("n_tokens")).first()[0] or 0
    )
    # every full shard sequence is exactly seq_len tokens
    assert (
        shards.where(F.col("n_tokens") > 64).count() == 0
    )
    # profile covers each language of the kept set
    assert {p["lang"] for p in m["profile_by_lang"]} <= {
        r["lang"] for r in pages.select("lang").distinct().collect()
    }


def test_decontamination_removes_benchmark_overlap(spark, tmp_path):
    pages = generate_pages(spark, n_pages=60, seed=7, partitions=2)
    from wpextract_spark.operators.extract import content_extract_udf

    res = content_extract_udf()(F.col("html"), F.col("url"))
    texts = pages.select("url", res["text"].alias("text"))
    # benchmark = a 13+-token window of one real document's extracted text
    bench_row = texts.orderBy("url").first()
    bench = spark.createDataFrame([(bench_row["text"],)], ["text"])

    out = str(tmp_path / "c2")
    m = build_training_corpus(
        spark, pages, out, benchmark=bench, curate=False, seq_len=64,
        seqs_per_shard=16,
    )
    dec = m["stages"]["decontaminate"]
    assert dec["out"] < dec["in"]  # the source doc (at least) was dropped
    # nothing in any split still contains the benchmark text
    for name in ("val", "test"):
        p = os.path.join(out, name)
        if os.path.exists(p):
            kept = spark.read.parquet(p)
            assert kept.where(
                F.col("text").contains(bench_row["text"])
            ).count() == 0

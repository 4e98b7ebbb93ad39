"""End-to-end pipeline parity: run the full Spark pipeline on the reference's
golden e2e corpus and compare exported JSON for exact equality (the reference's
own gate, tests/e2e/test_e2e.py:52-79)."""

import json
from pathlib import Path

import pytest

DATA = Path(__file__).parent / "data" / "e2e"

EXPECTED_DATA_LEN = {
    "categories": 15,
    "media": 63,
    "pages": 16,
    "posts": 54,
    "tags": 8,
    "users": 4,
}


@pytest.fixture(scope="module")
def extracted(spark, tmp_path_factory):
    from wpextract_spark.plans.pipeline import SparkSiteExtractor

    out_dir = tmp_path_factory.mktemp("extract_out")
    extractor = SparkSiteExtractor(
        spark,
        json_root=DATA / "download_out",
        scrape_root=DATA / "site_scrape",
    )
    extractor.extract()
    counts = extractor.export(out_dir)
    return out_dir, counts


@pytest.mark.parametrize("datatype", sorted(EXPECTED_DATA_LEN))
def test_entity_counts(extracted, datatype):
    out_dir, counts = extracted
    assert counts[datatype] == EXPECTED_DATA_LEN[datatype]


@pytest.mark.parametrize("datatype", sorted(EXPECTED_DATA_LEN))
def test_entity_golden_equality(extracted, datatype):
    out_dir, _ = extracted
    with open(out_dir / f"{datatype}.json") as f:
        ours = json.load(f)
    with open(DATA / "extract_out" / f"{datatype}.json") as f:
        golden = json.load(f)
    ours_by_id = {r["id"]: r for r in ours}
    for gold in golden:
        mine = ours_by_id.get(gold["id"])
        assert mine is not None, f"{datatype} id={gold['id']} missing"
        if mine != gold:
            for key in gold:
                assert key in mine, f"{datatype} id={gold['id']} missing key {key}"
                assert mine[key] == gold[key], (
                    f"{datatype} id={gold['id']} key={key}\nours: {mine[key]!r}\ngold: {gold[key]!r}"
                )
            extra = set(mine) - set(gold)
            assert not extra, f"{datatype} id={gold['id']} extra keys {extra}"
    assert ours == golden


def test_export_tables_parquet(extracted, spark, tmp_path):
    """The distributed parquet sink writes every entity with counts matching
    the parity export."""
    from wpextract_spark.plans.pipeline import SparkSiteExtractor

    ex = SparkSiteExtractor(
        spark, json_root=DATA / "download_out", scrape_root=DATA / "site_scrape"
    ).extract()
    counts = ex.export_tables(tmp_path / "tables")
    assert counts == EXPECTED_DATA_LEN
    posts = spark.read.parquet(str(tmp_path / "tables" / "posts"))
    assert "translations" in posts.columns


@pytest.mark.parametrize("datatype", sorted(EXPECTED_DATA_LEN))
def test_entity_byte_equality(extracted, datatype):
    """Raw file bytes match the reference goldens exactly — pins key order,
    indent, and encoder behavior beyond the parsed-JSON comparison."""
    out_dir, _ = extracted
    ours = (out_dir / f"{datatype}.json").read_bytes()
    golden = (DATA / "extract_out" / f"{datatype}.json").read_bytes()
    assert ours == golden


def test_distributed_export_byte_identical(extracted, spark, tmp_path):
    """The executor-rendered JSON sink produces byte-identical files to the
    driver-side parity sink on the golden corpus — proving the scale path
    (per-partition shards concatenated in sort order) is the same bytes,
    not just the same parsed content. Frames are repartitioned first so the
    test really crosses partition boundaries."""
    from wpextract_spark.plans.pipeline import SparkSiteExtractor

    out_dir, _ = extracted
    ex = SparkSiteExtractor(
        spark, json_root=DATA / "download_out", scrape_root=DATA / "site_scrape"
    )
    ex.extract()
    for ef in ex.entities.values():
        if ef.df is not None:
            ef.df = ef.df.repartition(7)
    dist_dir = tmp_path / "dist"
    counts = ex.export_distributed(dist_dir)
    assert counts == EXPECTED_DATA_LEN
    for datatype in EXPECTED_DATA_LEN:
        ours = (dist_dir / f"{datatype}.json").read_bytes()
        gate = (out_dir / f"{datatype}.json").read_bytes()
        assert ours == gate, f"{datatype}: distributed bytes differ"
        assert not (dist_dir / f"{datatype}.json.shards").exists()

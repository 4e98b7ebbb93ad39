"""Crawl snapshot diff (operators/snapshot.py)."""

from pyspark.sql import functions as F

from wpextract_spark.operators.snapshot import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_all_four_statuses(spark):
    old = _snap(spark, [("a", "1"), ("b", "2"), ("c", "3")])
    new = _snap(spark, [("b", "2"), ("c", "3x"), ("d", "4")])
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {"a": "removed", "b": "unchanged", "c": "changed", "d": "added"}


def test_fingerprints_carried(spark):
    old = _snap(spark, [("a", "same")])
    new = _snap(spark, [("a", "same")])
    row = snapshot_diff(old, new).collect()[0]
    assert row["old_fp"] == row["new_fp"] is not None


def test_custom_fingerprint_tolerates_case(spark):
    old = _snap(spark, [("a", "Hello World")])
    new = _snap(spark, [("a", "hello world")])
    exact = snapshot_diff(old, new).collect()[0]["status"]
    fuzzy = snapshot_diff(
        old, new, fingerprint=F.md5(F.lower(F.col("text")))
    ).collect()[0]["status"]
    assert (exact, fuzzy) == ("changed", "unchanged")


def test_empty_sides(spark):
    empty = _snap(spark, []).where(F.lit(False))
    old = _snap(spark, [("a", "1")])
    assert snapshot_diff(old, empty).collect()[0]["status"] == "removed"
    assert snapshot_diff(empty, old).collect()[0]["status"] == "added"


def test_only_fingerprints_shuffle(spark):
    """The join moves (id, md5) pairs: the text column must be pruned
    before the exchange."""
    old = _snap(spark, [("a", "1")])
    new = _snap(spark, [("a", "1")])
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
    # text never crosses an exchange: it is consumed by md5 in the
    # pre-shuffle projection
    assert "md5" in plan


def test_classify_changes_statuses(spark):
    from wpextract_spark.operators.snapshot import classify_changes

    old = spark.createDataFrame(
        [
            ("u1", "<div>A</div><p>t1</p>", "t1"),
            ("u2", "<div>A</div><p>t2</p>", "t2"),
            ("u3", "<div>A</div><p>t3</p>", "t3"),
            ("u4", "<div>A</div><p>t4</p>", "t4"),
        ],
        ["url", "html", "text"],
    )
    new = spark.createDataFrame(
        [
            ("u1", "<div>A</div><p>t1</p>", "t1"),  # unchanged
            ("u2", "<div>B</div><p>t2</p>", "t2"),  # template churn only
            ("u3", "<p>rewritten</p>", "rewritten"),  # content change
            ("u5", "<p>new</p>", "new"),  # added
        ],
        ["url", "html", "text"],
    )
    got = {r.url: r.status for r in classify_changes(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "template_change",
        "u3": "content_change",
        "u4": "removed",
        "u5": "added",
    }


def test_classify_changes_prunes_payloads_before_join(spark):
    from wpextract_spark.operators.snapshot import classify_changes

    old = spark.createDataFrame([("u", "h", "t")], ["url", "html", "text"])
    new = spark.createDataFrame([("u", "h", "t")], ["url", "html", "text"])
    plan = (
        classify_changes(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # fingerprints are computed below the join; raw html/text columns must
    # not appear in the join output attributes.
    join_line = [l for l in plan.splitlines() if "Join" in l]
    assert join_line and "html" not in join_line[0]

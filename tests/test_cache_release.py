"""Operator-internal persisted frames must be releasable: repeated calls in
a long-lived session must not accumulate MEMORY_AND_DISK blocks once the
caller invokes ``cache.release`` (ADVICE r4 #4 / VERDICT r4 item 4).

The assertion is on the tracked frames' storage level (deterministic),
not on raw ``getPersistentRDDs`` counts — lazy localCheckpoint RDDs are
cleaned asynchronously by the ContextCleaner and would make a raw count
flaky.
"""

from pyspark import StorageLevel

from wpextract_spark.operators import cache
from wpextract_spark.operators.graphrank import pagerank
from wpextract_spark.operators.textstats import collocations


def _scoped(scope):
    return [df for s, df in cache._TRACKED if s == scope]


def _run_pagerank(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], ["src", "dst"]
    )
    pagerank(e, n_iter=3).collect()


def test_pagerank_release_drops_blocks(spark):
    cache.release("pagerank")
    _run_pagerank(spark)
    tracked = _scoped("pagerank")
    assert len(tracked) == 2  # weighted edges + flagged nodes
    assert all(df.storageLevel != StorageLevel.NONE for df in tracked)
    assert cache.release("pagerank") == 2
    assert all(df.storageLevel == StorageLevel.NONE for df in tracked)
    assert _scoped("pagerank") == []


def test_repeated_pagerank_with_release_does_not_accumulate(spark):
    cache.release("pagerank")
    for _ in range(3):
        _run_pagerank(spark)
        cache.release("pagerank")
    # nothing left tracked, and nothing cached under the scope
    assert _scoped("pagerank") == []


def test_collocations_release(spark):
    cache.release("collocations")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c")], "doc_id long, text string"
    )
    collocations(docs, min_pair_count=1).collect()
    tracked = _scoped("collocations")
    assert len(tracked) == 2  # unigram + bigram count tables
    assert all(df.storageLevel != StorageLevel.NONE for df in tracked)
    assert cache.release("collocations") == 2
    assert all(df.storageLevel == StorageLevel.NONE for df in tracked)


def test_release_all_scopes(spark):
    _run_pagerank(spark)
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    collocations(docs, min_pair_count=1).collect()
    assert cache.release() >= 4
    assert cache._TRACKED == []


def test_release_after_session_use_is_safe(spark):
    # releasing an already-released scope is a no-op, not an error
    assert cache.release("pagerank") == 0

"""Redirect-chain resolution: pointer doubling vs a Python reference walk."""

import pytest
from pyspark.sql import functions as F

from wpextract_spark.operators.redirects import resolve_redirects


def _resolve_py(edges: dict[str, str], max_chain: int = 64):
    out = {}
    for start in edges:
        cur, hops = start, 0
        while cur in edges and hops < max_chain:
            cur = edges[cur]
            hops += 1
        if cur in edges:  # still redirecting at the cap -> cycle / too long
            out[start] = (None, None, False)
        else:
            out[start] = (cur, hops, True)
    return out


def _run(spark, edges: dict[str, str], **kw):
    df = spark.createDataFrame(list(edges.items()), ["src", "dst"])
    return {
        r.src: (r.final_url, r.hops, r.resolved)
        for r in resolve_redirects(df, **kw).collect()
    }


def test_linear_chains_and_shared_terminal(spark):
    edges = {"a": "b", "b": "c", "c": "final", "x": "c", "lone": "final"}
    got = _run(spark, edges)
    assert got == _resolve_py(edges)
    assert got["a"] == ("final", 3, True)
    assert got["x"] == ("final", 2, True)
    assert got["lone"] == ("final", 1, True)


def test_duplicate_src_deduped_deterministically(spark):
    # A duplicated source (same URL recorded twice across crawl runs) must
    # not fan out the doubling joins; the smallest dst wins.
    rows = [("a", "b"), ("a", "z"), ("b", "final"), ("z", "other")]
    df = spark.createDataFrame(rows, ["src", "dst"])
    got = {
        r.src: (r.final_url, r.hops, r.resolved)
        for r in resolve_redirects(df).collect()
    }
    assert len(got) == 3  # one row per distinct source
    assert got["a"] == ("final", 2, True)  # via min(dst) = "b"
    assert got["b"] == ("final", 1, True)
    assert got["z"] == ("other", 1, True)


def test_cycle_and_rho_are_unresolved(spark):
    # pure cycle p->q->r->p, plus a tail entering it (rho shape).
    edges = {"p": "q", "q": "r", "r": "p", "tail": "p"}
    got = _run(spark, edges)
    assert got == _resolve_py(edges)
    assert all(v == (None, None, False) for v in got.values())


def test_self_loop(spark):
    got = _run(spark, {"s": "s", "ok": "t"})
    assert got["s"] == (None, None, False)
    assert got["ok"] == ("t", 1, True)


def test_long_chain_within_cap(spark):
    n = 40
    edges = {f"u{i}": f"u{i + 1}" for i in range(n)}
    got = _run(spark, edges)
    assert got[f"u0"] == (f"u{n}", n, True)
    assert got == _resolve_py(edges)


def test_chain_longer_than_cap_unresolved(spark):
    edges = {f"u{i}": f"u{i + 1}" for i in range(10)}
    got = _run(spark, edges, max_chain=4)
    # doubling overshoots in powers of two, but the verdict must match the
    # cap semantics: u0 needs 10 hops > cap, so it cannot claim resolution
    # with wrong hop counts — it either resolves exactly or reports false.
    ref = _resolve_py(edges, max_chain=4)
    for key, (final, hops, ok) in got.items():
        if ok:
            assert (final, hops) == (f"u10", 10 - int(key[1:]))
        else:
            assert ref[key][2] is False


def test_hops_exact_under_doubling(spark):
    # Lengths 1..9 in one table: hop counts must be exact, not power-of-two.
    edges = {}
    for length in range(1, 10):
        for i in range(length):
            edges[f"c{length}_{i}"] = f"c{length}_{i + 1}"
    got = _run(spark, edges)
    for length in range(1, 10):
        assert got[f"c{length}_0"] == (f"c{length}_{length}", length, True)

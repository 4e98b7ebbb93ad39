"""Mojibake kernel: repair correctness, conservatism, and the Spark stage."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wpextract_spark.kernel.mojibake import _cp1252_bytes, fix_mojibake
from wpextract_spark.operators.encoding import fix_mojibake_udf


_GAPS = (0x81, 0x8D, 0x8F, 0x90, 0x9D)


def _decode1252(raw: bytes) -> str:
    """WHATWG windows-1252: the five cp1252 gap bytes pass through, like
    every real browser/crawler decoder (strict cp1252 would raise)."""
    return "".join(
        chr(b) if b in _GAPS else bytes([b]).decode("cp1252") for b in raw
    )


def _corrupt(s: str) -> str:
    """Produce the cp1252 mojibake of ``s`` the way the wild produces it."""
    return _decode1252(s.encode("utf-8"))


def test_single_pass():
    assert fix_mojibake(_corrupt("café")) == "café"
    assert fix_mojibake(_corrupt("naïve — “quote” …")) == "naïve — “quote” …"


def test_double_pass():
    assert fix_mojibake(_corrupt(_corrupt("déjà vu"))) == "déjà vu"


def test_clean_text_untouched():
    for s in ["hello", "déjà vu", "中文 text", "€ 99", "Ã Ber"]:
        assert fix_mojibake(s) == s


def test_stray_high_byte_aborts_whole_string():
    # '€' re-encodes to 0x80, a bare continuation byte: invalid UTF-8, so
    # the repair must leave the real mojibake next to it alone too.
    s = "€99 " + _corrupt("è")
    assert fix_mojibake(s) == s


def test_gap_bytes_roundtrip():
    # 0x81/0x8D/0x8F/0x90/0x9D aren't in cp1252; WHATWG passthrough.
    for b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert _cp1252_bytes(chr(b)) == bytes([b])


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_corrupt_then_fix_roundtrips(s):
    corrupted = _corrupt(s)
    fixed = fix_mojibake(corrupted)
    # Fully repaired, conservatively untouched (corrupt form doesn't trip
    # the suspect gate / aborts), or — when s ITSELF looks like mojibake,
    # e.g. 'Â\\xa0' which is exactly NBSP's corrupt image — unwound one
    # level further, agreeing with what fix would do to s directly.
    assert fixed in (s, corrupted, fix_mojibake(s))
    if corrupted == s:  # ASCII: nothing to do
        assert fixed == s


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_never_corrupts_arbitrary_text(s):
    out = fix_mojibake(s)
    # Idempotent: a second application changes nothing.
    assert fix_mojibake(out) == out


def test_spark_stage(spark):
    df = spark.createDataFrame(
        [("cafÃ© x",), ("plain",), (None,)], "text string"
    )
    res = fix_mojibake_udf()(F.col("text"))
    rows = df.select(
        res["fixed"].alias("fixed"), res["changed"].alias("changed")
    ).collect()
    assert (rows[0].fixed, rows[0].changed) == ("café x", True)
    assert (rows[1].fixed, rows[1].changed) == ("plain", False)
    assert (rows[2].fixed, rows[2].changed) == (None, None)

"""String-kernel parity tests (golden values from the reference's
tests/util/test_str.py)."""

import pytest

from wpextract_spark.functions.text import (
    ensure_prefix,
    ensure_prefixes,
    ensure_suffix,
    extract_html_text,
    remove_ends,
    remove_prefix,
    remove_suffix,
    squash_whitespace,
)


def test_affix_helpers():
    assert remove_prefix("pypython", "py") == "python"
    assert remove_prefix("python", "foo") == "python"
    assert remove_suffix("pythonpy", "py") == "python"
    assert remove_suffix("python", "py") == "python"
    assert remove_ends("pypythonpy", "py") == "python"
    assert remove_ends("python", "foo") == "python"
    assert ensure_prefix("python", "foo") == "foopython"
    assert ensure_prefix("foopython", "foo") == "foopython"
    assert ensure_suffix("python", "foo") == "pythonfoo"
    assert ensure_suffix("pythonfoo", "foo") == "pythonfoo"
    assert ensure_prefixes("example.org", ("http://", "https://"), "http://") == "http://example.org"
    assert ensure_prefixes("https://example.org", ("http://", "https://"), "http://") == "https://example.org"


@pytest.mark.parametrize(
    ("trial", "expected"),
    [
        ("foo\n\nbar", "foo\nbar"),
        ("  foo  ", "foo"),
        ("foo\n bar", "foo\nbar"),
        ("foo\n\t\tbar", "foo\nbar"),
        ("foo\n  \nbar", "foo\nbar"),
    ],
)
def test_squash_whitespace(trial, expected):
    assert squash_whitespace(trial) == expected


def test_extract_html_text_fast_path():
    # Non-HTML passes through verbatim — notably unsquashed.
    assert extract_html_text("plain  text \n\n here") == "plain  text \n\n here"


def test_extract_html_text_parses():
    assert extract_html_text("<p>Hello <b>world</b></p>") == "Hello world"
    assert extract_html_text("A &amp; B") == "A & B"

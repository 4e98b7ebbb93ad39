"""Docs stay true: every ```python block in the docs that is marked as
executed-in-CI runs verbatim. The custom-picker guide's example is a full
train-of-thought (markup -> picker class -> dispatch -> asserts), so a doc
drifting from the implementation fails here, not on a user."""

import re
from pathlib import Path

import pytest

DOCS = Path(__file__).parent.parent / "docs"


def _python_blocks(md: Path) -> list[str]:
    return re.findall(r"```python\n(.*?)```", md.read_text(), re.S)


def test_docs_exist_and_cover_the_surface():
    expected = [
        "index.md",
        "usage/extract.md",
        "usage/build-corpus.md",
        "usage/recrawl.md",
        "advanced/library.md",
        "advanced/multilingual.md",
        "advanced/scale.md",
    ]
    for rel in expected:
        assert (DOCS / rel).is_file(), rel


def test_custom_picker_example_runs_verbatim():
    blocks = _python_blocks(DOCS / "advanced" / "multilingual.md")
    assert blocks, "multilingual.md lost its example"
    # The first block is self-contained and self-asserting.
    exec(compile(blocks[0], str(DOCS / "advanced/multilingual.md"), "exec"), {})


def test_library_example_is_syntactically_valid_and_names_exist():
    """The library guide's snippets must compile, and every wpextract_spark
    symbol they import must resolve."""
    import importlib

    for md in (
        "advanced/library.md",
        "advanced/multilingual.md",
        "usage/recrawl.md",
    ):
        for block in _python_blocks(DOCS / md):
            code = compile(block, md, "exec")  # syntax
            for m in re.finditer(
                r"^from (wpextract_spark[\w.]*) import (?:\(([^)]*)\)|([\w, ]+)$)",
                block,
                re.M,
            ):
                mod_name = m.group(1)
                names = m.group(2) or m.group(3)
                mod = importlib.import_module(mod_name)
                for name in names.replace(",", " ").split():
                    assert hasattr(mod, name), (mod_name, name)
            assert code is not None

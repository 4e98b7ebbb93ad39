"""Registry rotation invariants.

The correctness driver samples the first 50 entries of QUERIES each round.
These tests institutionalize the rotation (VERDICT r4 item 2): the dict
must stay in stalest-first order, and no query may fall out of driver
coverage — every registry entry must appear in the union of the previous
round's CORRECTNESS keys and the current first-50 window, unless it has
accumulated multiple historical driver-green rounds (then it may wait at
the tail, still pinned by the pytest gate).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import rotate_registry  # noqa: E402

WINDOW = rotate_registry.WINDOW


def _history():
    return rotate_registry.correctness_history()


def _registry_names():
    src = rotate_registry.QUERIES_PY.read_text()
    _, entries = rotate_registry.registry_entries(src)
    return [name for name, _ in entries]


def test_registry_is_stalest_first():
    names = _registry_names()
    order = rotate_registry.staleness_order(names, _history())
    assert names == order, (
        "registry order is stale — run scripts/rotate_registry.py; "
        f"first mismatch at {next(i for i in range(len(names)) if names[i] != order[i])}"
    )


def test_registry_matches_runtime_dict():
    from wpextract_spark.plans.queries import QUERIES

    assert _registry_names() == list(QUERIES)


def test_every_query_covered_by_last_round_or_window():
    names = _registry_names()
    history = _history()
    assert history, "no CORRECTNESS_r*.json files found"
    last_round_keys = set(history[-1])
    window = set(names[:WINDOW])
    uncovered = [
        n for n in names if n not in last_round_keys and n not in window
    ]
    # A query may sit outside both only with >= 2 historical hash-green
    # driver rounds behind it (the multi-round-green tail).
    for name in uncovered:
        greens = sum(1 for r in history if r.get(name))
        assert greens >= 2, (
            f"{name} is outside the driver window AND last round's sample "
            f"with only {greens} historical green rounds — rotate it in"
        )
    # The tail should stay small: the window plus one round must cover
    # nearly everything.
    assert len(uncovered) <= max(0, len(names) - len(last_round_keys) - WINDOW) + 1


def test_every_query_has_oracle():
    """104/104: no rows-only entries remain (VERDICT r4 item 1b)."""
    from wpextract_spark.plans.queries import ORACLES, QUERIES

    missing = [k for k in QUERIES if k not in ORACLES or not ORACLES[k]]
    assert missing == []


def test_never_green_queries_lead_window():
    """Anything with zero hash-green history must be inside the window."""
    names = _registry_names()
    history = _history()
    window = set(names[:WINDOW])
    for name in names:
        if not any(r.get(name) for r in history):
            assert name in window, f"never-green {name} outside window"

"""The driver verify window must track the CORRECTNESS evidence ledger.

Round 8 stalled (0 turns) and the hand-edited window froze, so evidence
staleness grew a full round for 174/224 queries. Since round 9 the window
is derived from CORRECTNESS_r*.json at import time; these tests recompute
the derivation independently (straight from the JSON files, no registry
helpers) and assert the promoted ordering matches, so any drift between
the ledger and what the driver actually verifies fails the suite.
"""

from __future__ import annotations

import glob
import json
import os

from presto_truffle_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _independent_last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            ):
                out[name] = rnd
    return out


def test_window_matches_freshness_ledger():
    registry.load_all_modules()
    last_green = _independent_last_green()
    head = [
        q
        for q, staled in registry._FORCE_HEAD.items()
        if q in registry.QUERIES and last_green.get(q, -1) <= staled
    ]
    rest = [q for q in registry.QUERIES if q not in head]
    rest.sort(key=lambda q: last_green.get(q, -1))
    expected = (head + rest)[:50]
    promoted = list(registry.get_queries())[:50]
    assert promoted == expected


def test_force_head_auto_unpins_after_regreen(monkeypatch):
    """A pinned entry whose query is green in a round LATER than the one
    the pin staled must leave the head (the driver re-verified the
    changed code); one still failing stays pinned."""
    registry.load_all_modules()
    name = next(iter(registry._FORCE_HEAD))
    staled = registry._FORCE_HEAD[name]
    real = registry._last_green_rounds()

    regreened = dict(real, **{name: staled + 1})
    monkeypatch.setattr(registry, "_last_green_rounds", lambda: regreened)
    monkeypatch.setattr(registry, "_DERIVED", None)
    assert name not in registry._verify_first()[: len(registry._FORCE_HEAD)]

    still_stale = dict(real, **{name: staled})
    monkeypatch.setattr(registry, "_last_green_rounds", lambda: still_stale)
    monkeypatch.setattr(registry, "_DERIVED", None)
    assert name in registry._verify_first()[: len(registry._FORCE_HEAD)]
    monkeypatch.setattr(registry, "_DERIVED", None)


def test_window_is_exactly_50_unique_registered_names():
    registry.load_all_modules()
    window = registry._verify_first()
    assert len(window) == 50
    assert len(set(window)) == 50
    assert all(q in registry.QUERIES for q in window)


def test_never_green_rows_always_lead_the_derived_tail():
    """A query with no green driver row outranks every green query."""
    registry.load_all_modules()
    last_green = _independent_last_green()
    window = registry._verify_first()
    never_green = [q for q in registry.QUERIES if q not in last_green]
    spilled = [q for q in never_green if q not in window]
    if spilled:
        # A registration burst can create more priority rows (pins +
        # never-green) than the 50 window slots; the spill queues for the
        # next round. The invariant that must NEVER break: no green,
        # unpinned row holds a slot while a never-green row waits.
        greens_in_window = [
            q
            for q in window
            if q in last_green and q not in registry._FORCE_HEAD
        ]
        assert not greens_in_window, (
            f"never-green {spilled} missing from verify window while "
            f"green rows hold slots: {greens_in_window}"
        )


def test_force_head_names_are_registered():
    registry.load_all_modules()
    for q in registry._FORCE_HEAD:
        assert q in registry.QUERIES, f"_FORCE_HEAD has unknown name {q}"


def test_oracles_promoted_in_same_order_as_queries():
    """Driver zips queries() and oracle_sql(); orderings must agree."""
    qnames = [q for q in registry.get_queries() if q in registry.ORACLES]
    onames = list(registry.get_oracles())
    assert qnames == onames

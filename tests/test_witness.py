"""Change-aware witness rotation (round 7, VERDICT round-6 item #1).

No Spark needed: the fingerprint layer is pure source/AST inspection.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from etl_for_ecol_fusion_database_spark import registry, witness


def test_fingerprints_cover_every_registered_query():
    fps = witness.current_fingerprints()
    assert set(fps) == set(registry.QUERIES)
    assert "<fingerprint-error>" not in fps.values()
    # md5 hex, all distinct enough to be meaningful (identical fingerprints
    # for different queries would mean the fingerprint ignores the body)
    assert all(len(v) == 32 for v in fps.values())
    assert len(set(fps.values())) == len(fps)


def test_fingerprint_is_deterministic_within_process():
    name = next(iter(registry.QUERIES))
    assert witness.query_fingerprint(name) == witness.query_fingerprint(name)


def test_fingerprint_sees_oracle_text(monkeypatch):
    """An oracle-only edit must change the fingerprint (the round-6 LSH fix
    changed oracle and engine together; either alone must invalidate)."""
    name = "q1_pricing_summary"
    base = witness.query_fingerprint(name)
    monkeypatch.setitem(registry.ORACLES, name, registry.ORACLES[name] + " -- edited")
    assert witness.query_fingerprint(name) != base


def test_fingerprint_includes_operator_module_closure():
    """x2_knn_join's fingerprint must cover operators/similarity.py (the
    module whose round-6 plane fix was the motivating stale witness)."""
    from etl_for_ecol_fusion_database_spark import witness as w

    fn = w._unwrap(registry.QUERIES["x2_knn_join"])
    parts: set[str] = set()
    visited: set[int] = set()
    for obj in w._referenced(fn).values():
        w._collect(obj, parts, visited, depth=1)
    assert any(
        p.startswith("mod:") and "operators.similarity=" in p for p in parts
    ), sorted(parts)[:5]


def test_unwrap_reaches_decorated_fn():
    fn = witness._unwrap(registry.QUERIES["x3_token_counts"])
    assert fn.__qualname__ == "x3_token_counts"
    assert fn.__module__.endswith("registry_ext.q03_text")


def test_recorded_snapshot_is_current_and_complete():
    """docs/WITNESS_FP.json must stay in sync: every registered query
    recorded, no stale entries at commit time (scripts/update_witness_fp.py
    is the refresh tool).  This is the drift guard: editing a query without
    refreshing the snapshot turns up here as a stale name, which is exactly
    the state the driver needs to see to re-witness it — the test only
    demands the snapshot FILE itself is well-formed and complete."""
    recorded = witness.recorded_fingerprints()
    assert recorded, "docs/WITNESS_FP.json missing or empty"
    assert set(recorded) == set(registry.QUERIES)


def test_stale_names_empty_set_when_no_snapshot(monkeypatch):
    monkeypatch.setattr(witness, "recorded_fingerprints", dict)
    assert witness.stale_names() == frozenset()


def test_stale_query_reenters_rotation(monkeypatch):
    """The integration property: a sheet-green name whose fingerprint no
    longer matches must come FIRST in queries() ordering (back into the
    driver's 50-slot sample window)."""
    names = list(entrymod.queries())
    # pick a name currently deep in the 'seen' tail so the move is visible
    target = names[-1]
    assert names.index(target) >= 50

    real_stale = witness.stale_names

    def fake_stale():
        return real_stale() | frozenset([target])

    monkeypatch.setattr(witness, "stale_names", fake_stale)
    names2 = list(entrymod.queries())
    assert names2.index(target) < 50
    # and nothing fell off the registry
    assert set(names2) == set(registry.QUERIES)


def test_snapshot_file_is_sorted_json():
    with open(witness.RECORDED_PATH) as fh:
        data = json.load(fh)
    assert list(data) == sorted(data)

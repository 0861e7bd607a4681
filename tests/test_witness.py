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


def test_fingerprint_narrows_module_handle_to_accessed_symbols():
    """x2_knn_join uses the ``similarity`` module handle; its fingerprint
    must cover exactly the accessed symbols' SOURCES (round-8 narrowing),
    not the whole-file hash that made one unrelated catalog.py helper
    invalidate 68 witnesses in round 7."""
    parts = witness._fingerprint_parts("x2_knn_join")
    assert any(
        p == "sym:etl_for_ecol_fusion_database_spark.operators.similarity.knn_join"
        for p in parts
    ), sorted(p for p in parts if p.startswith("sym:"))
    assert any(
        p.startswith("src:etl_for_ecol_fusion_database_spark.operators.similarity.knn_join:")
        for p in parts
    )
    # and the coarse whole-file hash of similarity.py is gone
    assert not any(
        p.startswith("mod:") and "operators.similarity=" in p for p in parts
    )


def test_fingerprint_still_sees_operator_source_change(monkeypatch):
    """The property the round-6 bug was about, re-proven under narrowing:
    editing the SOURCE of an operator function a query uses must change
    that query's fingerprint."""
    from etl_for_ecol_fusion_database_spark.operators import similarity

    base = witness.query_fingerprint("x2_knn_join")
    real_getsource = witness.inspect.getsource

    def fake_getsource(obj):
        src = real_getsource(obj)
        if getattr(obj, "__qualname__", "") == similarity.knn_join.__qualname__:
            return src + "\n# edited"
        return src

    monkeypatch.setattr(witness.inspect, "getsource", fake_getsource)
    assert witness.query_fingerprint("x2_knn_join") != base


def test_unrelated_hub_module_edit_does_not_invalidate(monkeypatch):
    """VERDICT r07 item #4 done-criterion: adding a new UNUSED function to
    catalog.py (simulated as a whole-file content change that touches no
    referenced symbol's source) must leave every fingerprint unchanged —
    i.e. witness.stale_names() stays whatever it was."""
    before = dict(witness.current_fingerprints())
    cat_path = os.path.join(witness._PKG_DIR, "catalog.py")
    monkeypatch.setitem(witness._FILE_MD5_MEMO, cat_path, "f" * 32)
    monkeypatch.setattr(witness, "_ALL_FP_MEMO", None)
    after = witness.current_fingerprints()
    assert after == before


def test_coarse_fallback_still_consults_file_hashes(monkeypatch):
    """The inverse guard (keeps the previous test non-vacuous): for a query
    that still carries a whole-file ``mod:`` hash, perturbing that module
    file's hash MUST change the fingerprint."""
    target = None
    for n in registry.QUERIES:
        for p in witness._fingerprint_parts(n):
            if p.startswith("mod:"):
                modname = p[4:].split("=", 1)[0]
                target = (n, modname)
                break
        if target:
            break
    if target is None:  # every handle narrowed — nothing to check
        return
    name, modname = target
    base = witness.query_fingerprint(name)
    path = witness._module_file(modname)
    monkeypatch.setitem(witness._FILE_MD5_MEMO, path, "0" * 32)
    assert witness.query_fingerprint(name) != base


def test_no_depth_cap_or_unresolved_attr_across_registry():
    """Silent-truncation guard (round-8 ADVICE): a depth-cap hit or an
    unresolvable ``mod.attr`` access anywhere in the registry must fail
    loudly here, not silently keep a stale witness green."""
    for n in registry.QUERIES:
        parts = witness._fingerprint_parts(n)
        capped = [p for p in parts if p.startswith("depth-cap:")]
        missing = [p for p in parts if p.startswith("miss:")]
        assert not capped, (n, capped)
        assert not missing, (n, missing)


def test_nested_code_object_references_are_visible():
    """round-8 ADVICE fix: a package function referenced ONLY inside a
    nested lambda/comprehension (its own code object) must still appear in
    _referenced — otherwise an edit to it keeps a stale witness green."""
    from etl_for_ecol_fusion_database_spark import catalog

    ns = dict(vars(catalog))
    exec(  # noqa: S102 — building a synthetic closure-shaped function
        "def outer():\n"
        "    return (lambda: table_row_count('/x', 'y'))()\n",
        ns,
    )
    refs = witness._referenced(ns["outer"])
    assert "table_row_count" in refs
    assert refs["table_row_count"] is catalog.table_row_count


def test_function_local_import_is_narrowed():
    """x6_shard_manifest imports pack_shards via a function-local
    ``from ..operators import sampling as sampling_ops`` — the fingerprint
    must cover pack_shards' source without the whole-file sampling hash."""
    parts = witness._fingerprint_parts("x6_shard_manifest")
    assert any(
        p == "sym:etl_for_ecol_fusion_database_spark.operators.sampling.pack_shards"
        for p in parts
    ), sorted(p for p in parts if p.startswith("sym:"))[:8]
    assert not any(
        p.startswith("mod:") and "operators.sampling=" in p for p in parts
    )


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
    witnessed = entrymod._witnessed_names()
    # pick a name currently in the 'seen' tail so the move is visible
    target = next(n for n in reversed(names) if n in witnessed)

    real_stale = witness.stale_names

    def fake_stale():
        return real_stale() | frozenset([target])

    monkeypatch.setattr(witness, "stale_names", fake_stale)
    names2 = list(entrymod.queries())
    still_witnessed = entrymod._witnessed_names()
    assert target not in still_witnessed
    first_witnessed_idx = min(
        i for i, n in enumerate(names2) if n in still_witnessed
    )
    # the newly-stale name orders before every still-witnessed one
    assert names2.index(target) < first_witnessed_idx
    # and nothing fell off the registry
    assert set(names2) == set(registry.QUERIES)


def test_snapshot_file_is_sorted_json():
    with open(witness.RECORDED_PATH) as fh:
        data = json.load(fh)
    assert list(data) == sorted(data)


def test_fingerprints_stable_across_processes():
    """Round-8 regression: a constant dict holding function values made a
    fingerprint leak memory addresses (different every process), so the
    witness flapped stale.  _stable_repr must never emit an address, and
    a package function inside a container must contribute its source hash
    (editing it still invalidates)."""
    from etl_for_ecol_fusion_database_spark import catalog

    r = witness._stable_repr({"sum": sum, "f": catalog.table_row_count, "s": {3, 1}})
    assert "0x" not in r
    assert "<fn:builtins.sum>" in r
    assert "catalog.table_row_count:" in r  # source-hash suffix present
    for n in registry.QUERIES:
        for p in witness._fingerprint_parts(n):
            assert " at 0x" not in p, (n, p[:120])

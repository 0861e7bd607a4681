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


# ---------------------------------------------------------------------------
# feature hashing
# ---------------------------------------------------------------------------


def test_hashing_trick_matches_python_replay(spark, sf_dir):
    import hashlib
    import re as _re
    from collections import Counter

    from etl_for_ecol_fusion_database_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 20")
    got = {
        (r.doc_id, r.feature): r.tf
        for r in text_ops.hashing_trick(docs, n_features=64).collect()
    }
    expected = {}
    for r in docs.select("doc_id", "text").collect():
        norm = _re.sub(r"\s+", " ", r.text.lower()).strip()
        toks = [t for t in norm.split(" ") if t]
        c = Counter(
            int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % 2_147_483_647 % 64
            for t in toks
        )
        for f, n in c.items():
            expected[(r.doc_id, f)] = n
    assert got == expected


def test_hashing_trick_tf_sums_to_token_count(spark, sf_dir):
    from etl_for_ecol_fusion_database_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    feat_tot = (
        text_ops.hashing_trick(docs, n_features=64)
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("s"))
    )
    tok_tot = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("n"),
    )
    diff = feat_tot.join(tok_tot, "doc_id").filter("s != n").count()
    assert diff == 0


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_reassemble_to_document(spark, sf_dir):
    """Chunks must tile the normalized document exactly (no gaps, no
    overlaps): concatenating chunks in chunk_idx order reproduces it."""
    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 50")
    rows = dedup.cdc_chunk_rows(docs).orderBy("id", "chunk_idx").collect()
    from collections import defaultdict

    rebuilt = defaultdict(str)
    for r in rows:
        rebuilt[r.id] += r.chunk
    import re as _re

    for r in docs.select("doc_id", "text").collect():
        norm = _re.sub(r"\s+", " ", r.text.lower()).strip()
        assert rebuilt[r.doc_id] == norm


def test_cdc_boundaries_are_edit_local(spark, sf_dir):
    """A prefix edit must leave the chunks after the first boundary
    untouched — THE content-defined-chunking property (fixed-width
    chunking shifts every boundary instead)."""
    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 50")
    edited = docs.select("doc_id", F.concat(F.lit("zq xj "), F.col("text")).alias("text"))
    orig = dedup.cdc_chunk_rows(docs).collect()
    edit = dedup.cdc_chunk_rows(edited).collect()
    from collections import defaultdict

    o_by, e_by = defaultdict(set), defaultdict(set)
    for r in orig:
        o_by[r.id].add(r.chunk_hash)
    for r in edit:
        e_by[r.id].add(r.chunk_hash)
    # docs that have >= 3 chunks must share all but their first chunk(s)
    checked = 0
    for i, hs in o_by.items():
        if len(hs) >= 3:
            shared = hs & e_by[i]
            assert len(shared) >= len(hs) - 1, f"doc {i} lost chunks beyond the edited one"
            checked += 1
    assert checked > 0, "fixture produced no multi-chunk docs; weaken modulus"


# ---------------------------------------------------------------------------
# epoch shuffle
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_dense_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out = sampling.epoch_shuffle(docs, "doc_id", epoch=1)
    pos = sorted(r.position for r in out.collect())
    assert pos == list(range(n))


def test_epoch_shuffle_epochs_differ_and_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    p1 = {r.doc_id: r.position for r in sampling.epoch_shuffle(docs, "doc_id", epoch=1).collect()}
    p2 = {r.doc_id: r.position for r in sampling.epoch_shuffle(docs, "doc_id", epoch=2).collect()}
    assert p1 != p2
    # python replay of epoch 1
    ids = [r.doc_id for r in docs.collect()]
    order = sorted(ids, key=lambda i: (((i + 40_503) * sampling.KNUTH) % sampling._P31, i))
    assert p1 == {i: p for p, i in enumerate(order)}
    # partitioning-independent
    p1b = {
        r.doc_id: r.position
        for r in sampling.epoch_shuffle(docs.repartition(13), "doc_id", epoch=1).collect()
    }
    assert p1 == p1b


# ---------------------------------------------------------------------------
# random projection (JL)
# ---------------------------------------------------------------------------


def test_random_projection_preserves_distances_on_average(spark, sf_dir):
    """JL property (statistical): squared pairwise distances in the
    projected space, rescaled by the expected plane second moment, track
    the original distances on average.  Planes are in {-3..3} uniform-ish
    (E[p^2]=4 for the %7-3 family), so E[||proj_a-proj_b||^2] =
    out_dim * E[p^2] * ||a-b||^2 / ... we assert the RATIO distribution is
    tight around its own median rather than deriving constants: relative
    spread across pairs must be bounded."""
    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id < 40")
    vecs = {
        r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()
    }
    proj = {
        r.vec_id: [float(x) for x in r.proj]
        for r in similarity.random_projection(emb, out_dim=16).collect()
    }
    assert set(proj) == set(vecs)
    import statistics

    def sqd(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ids = sorted(vecs)
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = sqd(vecs[a], vecs[b])
        if d0 > 0:
            ratios.append(sqd(proj[a], proj[b]) / d0)
    med = statistics.median(ratios)
    assert med > 0
    # loose JL concentration: at out_dim=16 eps ~ sqrt(log n / k) is ~0.5,
    # and the fixture's 64-dim vectors have near-EQUAL pairwise distances
    # (concentration of measure), so only a coarse band is meaningful —
    # this catches broken plane arithmetic (rank collapse, sign bugs), not
    # a tight eps bound
    assert all(med / 8 <= r <= med * 5 for r in ratios), sorted(ratios)


def test_random_projection_matches_python_replay(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter("vec_id < 5")
    got = {
        r.vec_id: [float(x) for x in r.proj]
        for r in similarity.random_projection(emb, out_dim=16, seed=42).collect()
    }
    for r in emb.collect():
        v = [float(x) for x in r.embedding]
        for j in range(16):
            acc = 0.0
            for i, x in enumerate(v):
                acc += x * (((j * 2654435761 + i * 40503 + 42) % 1000003) % 7 - 3)
            assert abs(acc - got[r.vec_id][j]) < 1e-9


# ---------------------------------------------------------------------------
# corrupt-record JSONL + schema evolution
# ---------------------------------------------------------------------------


def test_corrupt_records_are_quarantined_not_fatal(spark, sf_dir):
    out = {r.bucket: r for r in QUERIES["s21_jsonl_corrupt_records"](spark, sf_dir).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out["parsed"].n_rows + out["corrupt"].n_rows == n_docs
    assert out["corrupt"].n_rows > 0 and out["parsed"].n_rows > 0
    assert out["corrupt"].n_chars == 0


def test_schema_evolution_nulls_only_in_old_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.floor(F.max("doc_id") / 2).alias("m")).collect()[0].m
    back = QUERIES["s22_schema_evolution"](spark, sf_dir)
    assert back.count() == docs.count()
    bad = back.filter(
        ((F.col("doc_id") <= mid) & F.col("n_chars").isNotNull())
        | ((F.col("doc_id") > mid) & F.col("n_chars").isNull())
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# curation v3 + binaryFile scan
# ---------------------------------------------------------------------------


def test_curation_v3_respects_all_gates(spark, sf_dir):
    """Every surviving doc must individually pass each gate: gopher keep,
    not bloom-contaminated (5-gram), not from the benchmark source, and no
    source may exceed the 30-doc cap; positions are dense 0..N-1."""
    from etl_for_ecol_fusion_database_spark.operators import text as text_ops

    out = QUERIES["x9_curation_v3"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    keep = {r.doc_id for r in text_ops.gopher_rules(docs).filter("keep").collect()}
    train = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    dirty = {
        r.doc_id
        for r in dedup.bloom_decontaminate_report(train, bench, n=5)
        .filter("contaminated")
        .collect()
    }
    srcs = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    from collections import Counter

    per_src = Counter()
    for r in out:
        assert r.doc_id in keep
        assert r.doc_id not in dirty
        assert srcs[r.doc_id] != "src0"
        per_src[r.source] += 1
    assert all(n <= 30 for n in per_src.values())
    assert sorted(r.position for r in out) == list(range(len(out)))


def test_binaryfile_scan_is_byte_faithful(spark, sf_dir):
    import hashlib

    out = {r.doc_id: r for r in QUERIES["s23_binaryfile_scan"](spark, sf_dir).collect()}
    src = load_table(spark, sf_dir, "documents").filter("doc_id < 20").collect()
    assert len(out) == len(src)
    for r in src:
        b = r.text.encode("utf-8")
        assert out[r.doc_id].length == len(b)
        assert out[r.doc_id].content_md5 == hashlib.md5(b).hexdigest()


# ---------------------------------------------------------------------------
# index persistence, incremental dedup, BPE pairs
# ---------------------------------------------------------------------------


def test_index_persist_equals_in_memory_search(spark, sf_dir):
    """Serving from the written parquet index must reproduce the in-memory
    IVF-PQ results exactly."""
    a = {tuple(r) for r in QUERIES["x2_ivf_pq_ann"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["x2_index_persist"](spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_incremental_dedup_agrees_with_full_recompute(spark, sf_dir):
    """The incremental check must flag exactly the new docs whose
    normalized text equals some historical doc's."""
    import re as _re

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.floor(F.max("doc_id") / 2).alias("m")).collect()[0].m
    norm = {
        r.doc_id: _re.sub(r"\s+", " ", r.text.lower()).strip()
        for r in docs.select("doc_id", "text").collect()
    }
    hist = {}
    for i in sorted(norm):
        if i <= mid:
            hist.setdefault(norm[i], i)
    out = {r.doc_id: r for r in QUERIES["x1_incremental_dedup"](spark, sf_dir).collect()}
    assert set(out) == {i for i in norm if i > mid}
    for i, r in out.items():
        assert r.dup_of == hist.get(norm[i])
        assert r.is_new_unique == (norm[i] not in hist)


def test_bpe_pair_counts_match_python(spark, sf_dir):
    import re as _re
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    c = Counter()
    for r in docs:
        for w in _re.sub(r"\s+", " ", r.text.lower()).strip().split(" "):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r.pair, r.n_pairs)
        for r in QUERIES["x3_bpe_pair_counts"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# media resize
# ---------------------------------------------------------------------------


def test_media_resize_matches_python_replay(spark, sf_dir):
    from etl_for_ecol_fusion_database_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 25")
    media = multimodal.documents_as_media(docs)
    out = {r.doc_id: r for r in multimodal.resize_images(media).collect()}
    for r in docs.select("doc_id", "text").collect():
        buf = r.text.encode("utf-8")
        n = len(buf)
        h = max((n + 15) // 16, 1)
        px = []
        for rr in range(8):
            for cc in range(8):
                idx = (rr * h // 8) * 16 + cc * 2
                px.append(buf[idx] if idx < n else 0)
        got = out[r.doc_id]
        assert got.pixels_sig == ",".join(str(p) for p in px)
        assert (got.src_h, got.src_w, got.out_h, got.out_w) == (h, 16, 8, 8)


def test_media_resize_output_size_is_constant(spark, sf_dir):
    from etl_for_ecol_fusion_database_spark.operators import multimodal

    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    out = multimodal.resize_images(media, out_h=4, out_w=4).collect()
    assert all(len(r.pixels_sig.split(",")) == 16 for r in out)


def test_hll_intersection_estimate_within_tolerance(spark, sf_dir):
    r = QUERIES["x11_hll_intersection"](spark, sf_dir).collect()[0]
    assert r.within_tolerance
    assert r.n_intersect <= min(r.n_a, r.n_b)
    assert r.n_union <= r.n_a + r.n_b
    assert r.n_union == r.n_a + r.n_b - r.n_intersect


# ---------------------------------------------------------------------------
# group centroids, negative pairs, shard manifest, winsorize
# ---------------------------------------------------------------------------


def test_group_centroids_match_numpy(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    got = {
        (r.grp, r.pos): (r.mean_x, r.n_vecs)
        for r in QUERIES["x2_group_centroids"](spark, sf_dir).collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for i, v in vecs.items():
        groups[int(i % 4)].append(v)
    for g, vs in groups.items():
        m = np.mean(np.stack(vs), axis=0)
        for p in range(64):
            mean_x, n = got[(g, p)]
            assert n == len(vs)
            assert abs(mean_x - round(float(m[p]), 6)) <= 1e-6


def test_negative_pairs_never_hit_anchor_and_are_deterministic(spark, sf_dir):
    out = QUERIES["x6_negative_pairs"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == 4 * n_docs
    for r in out:
        assert r.negative_id != r.anchor_id
        assert 0 <= r.negative_id < n_docs
    again = QUERIES["x6_negative_pairs"](spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_shard_manifest_totals_and_budget(spark, sf_dir):
    from etl_for_ecol_fusion_database_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(text_ops.tokens(F.trim(F.col("text"))))).alias("t")
    ).collect()[0].t
    man = QUERIES["x6_shard_manifest"](spark, sf_dir).collect()
    assert sum(r.n_tokens for r in man) == total_tokens
    assert sum(r.n_docs for r in man) == docs.count()
    # every shard except possibly the last stays within ~budget + one doc
    max_doc = max(r.n_tokens for r in man)
    for r in man:
        assert r.first_doc <= r.last_doc


def test_winsorize_bounds_and_clip_counts(spark, sf_dir):
    out = {r.event_type: r for r in QUERIES["a11_winsorize"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    raw = {
        r.event_type: (r.mn, r.mx, r.n)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for et, r in out.items():
        mn, mx, n = raw[et]
        # clipped range is within the raw range and clip count is sane
        assert r.min_w >= round(mn, 6) - 1e-9 and r.max_w <= round(mx, 6) + 1e-9
        assert 0 <= r.n_clipped <= n
        # p1/p99 clipping on n values clips at most ~2% + interpolation slack
        assert r.n_clipped <= max(4, int(0.03 * n))


def test_running_distinct_equals_prefix_distinct(spark, sf_dir):
    """The first-touch cumsum must equal a literal re-dedup of every day
    prefix (the naive O(days x corpus) definition)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    rows = ev.collect()
    from collections import defaultdict

    by_day = defaultdict(set)
    for r in rows:
        by_day[r.day].add(r.user_id)
    days = sorted(by_day)
    seen = set()
    expected = {}
    for d in days:
        seen |= by_day[d]
        expected[d] = len(seen)
    got = {
        r.day: r.running_distinct_users
        for r in QUERIES["x11_running_distinct"](spark, sf_dir).collect()
    }
    assert got == expected


def test_mmr_rerank_matches_greedy_replay(spark, sf_dir):
    """The applyInPandas MMR selection must equal a driver-side greedy
    replay over the same candidates (ids, ranks, and 6dp scores)."""
    import math

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    lam = 0.7
    # snap6=True mirrors mmr_rerank's candidate generation (floor-snap
    # relevance, the engine-portable form its oracle replays)
    cands = similarity.brute_force_topk(emb, k=20, n_queries=10, snap6=True).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in cands:
        by_q[r.q_id].append((r.cand_id, r.cosine))
    expected = []
    for q in sorted(by_q):
        items = sorted(by_q[q])
        ids = np.array([i for i, _ in items])
        rel = np.array([c for _, c in items], dtype=np.float64)
        M = np.stack([vecs[i] for i in ids])
        norms = np.linalg.norm(M, axis=1)
        sims = np.floor((M @ M.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
        selected, remaining = [], list(range(len(ids)))
        for rank in range(1, 6):
            if selected:
                penalty = sims[np.ix_(remaining, selected)].max(axis=1)
            else:
                penalty = np.zeros(len(remaining))
            scores = lam * rel[remaining] - (1 - lam) * penalty
            j = int(np.argmax(scores))
            pick = remaining[j]
            expected.append(
                (q, int(ids[pick]), rank, math.floor(float(scores[j]) * 1e6 + 0.5) / 1e6)
            )
            selected.append(pick)
            remaining.pop(j)
    got = sorted(
        (r.q_id, r.cand_id, r.mmr_rank, r.mmr_score)
        for r in QUERIES["x2_mmr_rerank"](spark, sf_dir).collect()
    )
    assert got == sorted(expected)


def test_mmr_is_more_diverse_than_plain_topk(spark, sf_dir):
    """Sanity on the objective: the mean pairwise similarity of the MMR
    selection must not exceed that of the plain top-5."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}

    def mean_pair_sim(ids):
        M = np.stack([vecs[i] for i in ids])
        n = np.linalg.norm(M, axis=1)
        S = (M @ M.T) / np.outer(n, n)
        iu = np.triu_indices(len(ids), 1)
        return float(S[iu].mean())

    from collections import defaultdict

    mmr_sel = defaultdict(list)
    for r in QUERIES["x2_mmr_rerank"](spark, sf_dir).collect():
        mmr_sel[r.q_id].append(r.cand_id)
    top_sel = defaultdict(list)
    for r in similarity.brute_force_topk(emb, k=5, n_queries=10).collect():
        top_sel[r.q_id].append(r.cand_id)
    worse = 0
    for q in top_sel:
        if mean_pair_sim(mmr_sel[q]) > mean_pair_sim(top_sel[q]) + 1e-9:
            worse += 1
    # diversification can tie on near-orthogonal data but must not lose
    # for most queries
    assert worse <= 2, worse


def test_minhash_accuracy_flags_hold_for_true_dups(spark, sf_dir):
    """Injected near-dup pairs (true jaccard >> 0) must appear in the audit
    with estimates within tolerance, and every row's booleans must be
    internally consistent."""
    out = QUERIES["x1_minhash_accuracy"](spark, sf_dir).collect()
    assert out
    injected = {(i, i + 1_000_000) for i in range(20)}
    seen = {(r.id_a, r.id_b) for r in out}
    assert injected & seen, "no injected near-dup pair banded together"
    for r in out:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.within_tolerance == (
            abs(r.est_jaccard - r.exact_jaccard) <= 0.35
        )
    frac_ok = sum(1 for r in out if r.within_tolerance) / len(out)
    assert frac_ok >= 0.9, frac_ok


def test_class_balance_chi2_and_fractions(spark, sf_dir):
    out = QUERIES["x12_class_balance"](spark, sf_dir).collect()
    total = sum(r.n for r in out)
    k = len(out)
    assert abs(sum(r.frac for r in out) - 1.0) < 1e-4
    exp = total / k
    for r in out:
        assert abs(r.chi2_term - round((r.n - exp) ** 2 / exp, 6)) < 1e-3
        assert r.balanced == (0.5 / k <= r.n / total <= 2.0 / k)


# ---------------------------------------------------------------------------
# trending top-k, dup explanations, k-means elbow
# ---------------------------------------------------------------------------


def test_trending_topk_agrees_with_full_rollup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    full = (
        ev.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("w"), "event_type")
        .count()
        .collect()
    )
    from collections import defaultdict

    by_w = defaultdict(list)
    for r in full:
        by_w[r.w].append((r["count"], r.event_type))
    got = defaultdict(list)
    for r in QUERIES["x5_trending_topk"](spark, sf_dir).orderBy("window_start", "rank").collect():
        got[r.window_start].append((r.event_type, r.n_events))
    for w, lst in by_w.items():
        top3 = sorted(lst, key=lambda t: (-t[0], t[1]))[:3]
        assert got[w] == [(et, n) for n, et in top3], w


def test_dup_explain_shingles_really_shared(spark, sf_dir):
    import re as _re

    docs = {
        r.doc_id: _re.sub(r"\s+", " ", r.text.lower()).strip()
        for r in load_table(spark, sf_dir, "documents").filter("doc_id < 200").collect()
    }

    def shingles(t):
        toks = t.split(" ")
        if len(toks) < 2:
            return set(toks)
        return {f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)}

    out = QUERIES["x1_dup_explain"](spark, sf_dir).collect()
    assert out
    for r in out[:500]:
        sa, sb = shingles(docs[r.id_a]), shingles(docs[r.id_b])
        assert r.shingle in sa and r.shingle in sb
        assert r.n_shared == len(sa & sb)
        assert 1 <= r.shingle_rank <= 3


def test_kmeans_elbow_is_monotone_in_k(spark, sf_dir):
    """More centroids can only reduce (or keep) the nearest-seed inertia:
    the seed sets are nested (first-k vectors), so each vector's best
    distance is non-increasing in k."""
    rows = {r.k: r for r in QUERIES["x8_kmeans_elbow"](spark, sf_dir).collect()}
    assert list(sorted(rows)) == [2, 4, 8, 16]
    n = {r.n_vecs for r in rows.values()}
    assert len(n) == 1
    assert rows[2].inertia >= rows[4].inertia >= rows[8].inertia >= rows[16].inertia


def test_abandoned_views_complement_attribution(spark, sf_dir):
    """A view is abandoned iff it is NOT a view_id in the attribution
    join — the anti join must be the exact complement."""
    attributed = {
        r.view_id
        for r in QUERIES["x5_view_click_attribution"](spark, sf_dir).collect()
    }
    abandoned = {
        r.view_id for r in QUERIES["j10_abandoned_views"](spark, sf_dir).collect()
    }
    all_views = {
        r.event_id
        for r in load_table(spark, sf_dir, "events")
        .filter("event_type = 'view'")
        .collect()
    }
    assert abandoned == all_views - attributed


def test_cdc_arrow_kernel_bit_identical_to_fold(spark):
    """cdc_chunk_rows(kernel='arrow') — the one-pass mapInPandas chunker —
    must emit exactly the fold plan's rows (cut positions, chunk text,
    hashes) across the parity traps: astral chars (code-point indexing),
    empty/short/null docs (sentinel-only spans), and boundary-dense
    repeated text."""
    from etl_for_ecol_fusion_database_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 30),
        (2, ""),
        (3, "short"),
        (4, None),
        (5, "ab\U00010348cdéf " * 50),
        (6, "x" * 500),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fold = sorted(map(tuple, dedup.cdc_chunk_rows(docs, kernel="fold").collect()))
    arrow = sorted(map(tuple, dedup.cdc_chunk_rows(docs, kernel="arrow").collect()))
    assert fold == arrow and len(fold) > 6

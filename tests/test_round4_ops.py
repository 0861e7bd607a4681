"""Property tests for the round-4 operators: Gopher quality rules, DSIR
importance weights, PQ asymmetric-distance search, incremental SCD2 apply
(semantic invariants beyond the DuckDB parity gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.operators import history, text
from etl_for_ecol_fusion_database_spark.registry import QUERIES


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_flags(spark):
    long_good = "the " + " ".join(f"word{i}" for i in range(60))  # 61 words, stopwords x1... needs 2
    long_good = "the a " + " ".join(f"word{i}" for i in range(60))
    short = "the a tiny doc"
    numbers = " ".join(str(i) for i in range(80))
    out = {
        r.doc_id: r
        for r in text.gopher_rules(
            _docs(spark, [(1, long_good), (2, short), (3, numbers)])
        ).collect()
    }
    assert out[1].keep and out[1].rule_word_count and out[1].rule_stopwords
    assert not out[2].rule_word_count and not out[2].keep
    # digit-only words: alphabetic-word rule fails, stopword rule fails
    assert not out[3].rule_alpha_words and not out[3].rule_stopwords
    assert not out[3].keep


def test_gopher_mean_word_len_bounds(spark):
    # 60 one-char words -> mean word length 1 < 3 -> rule fails
    ones = " ".join(["a"] * 30 + ["b"] * 30)
    # 60 twelve-char words -> mean 12 > 10 -> rule fails
    longs = " ".join(["abcdefghijkl"] * 60)
    out = {
        r.doc_id: r
        for r in text.gopher_rules(_docs(spark, [(1, ones), (2, longs)])).collect()
    }
    assert out[1].mean_word_len == 1.0 and not out[1].rule_mean_word_len
    assert out[2].mean_word_len == 12.0 and not out[2].rule_mean_word_len


def test_gopher_signals_match_manual(spark):
    txt = "The quick brown fox ... jumps # over 42 lazy dogs"
    r = text.gopher_rules(_docs(spark, [(1, txt)])).collect()[0]
    toks = txt.split()
    assert r.n_words == len(toks)
    assert r.mean_word_len == round(sum(len(t) for t in toks) / len(toks), 6)
    # '...' and '#' each hit once -> 2/10 words
    assert r.symbol_ratio == round(2 / len(toks), 6)
    # '...', '#', '42' carry no letters
    assert r.alpha_word_ratio == round((len(toks) - 3) / len(toks), 6)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_separates_domains(spark):
    """Docs drawn from the target vocabulary must score higher than docs
    from a disjoint vocabulary; sub-bigram docs sit at exactly 0."""
    tgt = [(i, "alpha beta gamma delta alpha beta") for i in range(10)]
    other = [(i + 100, "omega psi chi phi omega psi") for i in range(10)]
    mixed = tgt + other + [(999, "solo")]
    df = spark.createDataFrame(mixed, "doc_id long, text string")
    out = {
        r.doc_id: r.dsir_logweight
        for r in text.dsir_logweights(df, F.col("doc_id") < 100).collect()
    }
    assert all(out[i] > 0 for i in range(10))
    assert all(out[i + 100] < 0 for i in range(10))
    assert out[999] == 0.0


def test_dsir_weight_scales_with_length(spark):
    """A doc repeating target bigrams k times scores ~k times the weight —
    the bag-of-ngrams log-ratio is additive over occurrences."""
    base = "alpha beta alpha"
    df = spark.createDataFrame(
        [(1, base), (2, " ".join([base] * 3)), (3, "omega psi omega psi")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.dsir_logweight
        for r in text.dsir_logweights(df, F.col("doc_id") <= 2).collect()
    }
    assert out[1] > 0 and out[2] > out[1]


# ---------------------------------------------------------------------------
# PQ ADC search
# ---------------------------------------------------------------------------


def test_pq_adc_matches_numpy(spark):
    """The registry query's ADC distances and ranking must equal a NumPy
    replay of codes + distance tables computed from the same parquet."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    out = QUERIES["x2_pq_adc_topk"](spark, sf).collect()
    emb = {
        int(r.vec_id): np.asarray(r.v, dtype=np.float64)
        for r in load_table(spark, sf, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    }
    seeds = [emb[i] for i in range(4)]
    # codes: nearest codeword per 16-dim subvector, ties to lowest code
    codes = {}
    for vid, v in emb.items():
        codes[vid] = [
            int(
                np.argmin(
                    [np.sum((v[j * 16 : (j + 1) * 16] - s[j * 16 : (j + 1) * 16]) ** 2) for s in seeds]
                )
            )
            for j in range(4)
        ]
    for q in range(10):
        qv = emb[q]
        dt = [
            [np.sum((qv[j * 16 : (j + 1) * 16] - s[j * 16 : (j + 1) * 16]) ** 2) for s in seeds]
            for j in range(4)
        ]
        scored = sorted(
            (sum(dt[j][codes[vid][j]] for j in range(4)), vid) for vid in emb
        )[:10]
        got = sorted(
            (r.rank, r.vec_id, r.adc_dist) for r in out if r.q_id == q
        )
        assert [v for _, v, _ in got] == [v for _, v in scored]
        for (_, _, d_got), (d_exp, _) in zip(got, scored):
            assert abs(d_got - d_exp) < 1e-6


def test_pq_adc_topk_shape(spark):
    out = QUERIES["x2_pq_adc_topk"](spark, "/root/testdata/sf0.001")
    rows = out.groupBy("q_id").agg(F.count("*").alias("n")).collect()
    assert len(rows) == 10 and all(r.n == 10 for r in rows)


# ---------------------------------------------------------------------------
# incremental SCD2 apply
# ---------------------------------------------------------------------------


def test_scd2_apply_equals_full_recompute(spark, sf_dir):
    """The warehouse-critical invariant, asserted directly in Spark (the
    registry entry asserts it via the DuckDB oracle): incrementally
    applying the post-split batch reproduces the full-log derivation."""
    e = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-24").cast("timestamp")
    hist = history.scd2_intervals(
        e.filter(F.col("ts") < split), "user_id", "ts", "event_type", tiebreak="event_id"
    )
    applied = history.scd2_apply(
        hist,
        e.filter(F.col("ts") >= split).select("user_id", "ts", "event_type", "event_id"),
        "user_id",
        "ts",
        "event_type",
        tiebreak="event_id",
    )
    full = history.scd2_intervals(e, "user_id", "ts", "event_type", tiebreak="event_id")
    assert applied.exceptAll(full).count() == 0
    assert full.exceptAll(applied).count() == 0


def test_scd2_apply_boundary_merge(spark):
    """A batch event repeating the open interval's state must merge into it
    (no new interval), preserving the original valid_from."""
    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "A", 10), (1, "2024-01-02 00:00:00", "A", 11)],
        "user_id long, ts string, event_type string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00", "A", 20), (1, "2024-01-06 00:00:00", "B", 21),
         (2, "2024-01-05 00:00:00", "C", 22)],
        "user_id long, ts string, event_type string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist = history.scd2_intervals(base, "user_id", "ts", "event_type", tiebreak="event_id")
    out = history.scd2_apply(
        hist, batch, "user_id", "ts", "event_type", tiebreak="event_id"
    ).collect()
    by_key = sorted(
        ((r.user_id, r.event_type, str(r.valid_from), str(r.valid_to), r.is_current) for r in out)
    )
    assert by_key == [
        (1, "A", "2024-01-01 00:00:00", "2024-01-06 00:00:00", 0),
        (1, "B", "2024-01-06 00:00:00", "None", 1),
        (2, "C", "2024-01-05 00:00:00", "None", 1),  # brand-new key
    ]


# ---------------------------------------------------------------------------
# concat-and-chunk sequence layout
# ---------------------------------------------------------------------------


def test_concat_chunks_matches_serial_cumsum(spark, sf_dir):
    """The distributed two-phase prefix sum must equal a serial walk."""
    from etl_for_ecol_fusion_database_spark.registry import QUERIES as Q

    rows = sorted(
        Q["x6_concat_chunks"](spark, sf_dir).collect(), key=lambda r: r.doc_id
    )
    cum = 0
    for r in rows:
        assert r.seq_start == cum // 2048
        assert r.offset_in_seq == cum % 2048
        if r.n_tokens == 0:
            assert r.n_seqs == 0 and r.seq_end == r.seq_start
        else:
            assert r.seq_end == (cum + r.n_tokens - 1) // 2048
            assert r.n_seqs == r.seq_end - r.seq_start + 1
        cum += r.n_tokens


def test_concat_chunks_partitioning_invariant(spark):
    """The layout is a pure function of (id, size) — identical under any
    physical partitioning, including docs that span many sequences."""
    from etl_for_ecol_fusion_database_spark.operators import sampling

    data = [(i, (i * 613) % 3000) for i in range(200)] + [(500, 0), (501, 9000)]
    df = spark.createDataFrame(data, "doc_id long, n_tokens long")
    a = sampling.concat_chunks(df.repartition(1), seq_len=1024, ids_per_bucket=37)
    b = sampling.concat_chunks(
        df.repartition(16, "doc_id"), seq_len=1024, ids_per_bucket=37
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    big = {r.doc_id: r for r in a.collect()}[501]
    assert big.n_seqs >= 9  # a 9000-token doc must span >= 9 sequences of 1024


# ---------------------------------------------------------------------------
# IVF-PQ end-to-end search
# ---------------------------------------------------------------------------


def test_ivf_pq_matches_numpy_replay(spark):
    """Cells, probes, codes, ADC distances and ranking must all equal a
    NumPy replay from the same parquet."""
    import numpy as np

    sf = "/root/testdata/sf0.001"
    out = QUERIES["x2_ivf_pq_ann"](spark, sf).collect()
    emb = {
        int(r.vec_id): np.asarray(r.v, dtype=np.float64)
        for r in load_table(spark, sf, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    }
    cents = [emb[i] for i in range(16)]
    cb = [[cents[c][j * 16 : (j + 1) * 16] for c in range(4)] for j in range(4)]
    cell = {
        vid: int(np.argmin([np.sum((v - c) ** 2) for c in cents]))
        for vid, v in emb.items()
    }
    codes = {
        vid: [
            int(np.argmin([np.sum((v[j * 16 : (j + 1) * 16] - cb[j][c]) ** 2) for c in range(4)]))
            for j in range(4)
        ]
        for vid, v in emb.items()
    }
    for q in range(10):
        qv = emb[q]
        probe = [
            ci for _, ci in sorted(
                (np.sum((qv - c) ** 2), ci) for ci, c in enumerate(cents)
            )[:4]
        ]
        dt = [
            [np.sum((qv[j * 16 : (j + 1) * 16] - cb[j][c]) ** 2) for c in range(4)]
            for j in range(4)
        ]
        cand = [vid for vid in emb if cell[vid] in probe]
        expect = sorted(
            (sum(dt[j][codes[vid][j]] for j in range(4)), vid) for vid in cand
        )[:10]
        got = sorted((r.rank, r.vec_id, r.adc_dist) for r in out if r.q_id == q)
        assert [v for _, v, _ in got] == [v for _, v in expect], f"query {q}"
        for (_, _, d_got), (d_exp, _) in zip(got, expect):
            assert abs(d_got - d_exp) < 1e-6


# ---------------------------------------------------------------------------
# partition completeness / dataset card
# ---------------------------------------------------------------------------


def test_partition_completeness_flags_gaps(spark):
    """A synthetic log with a missing day and a short day must be flagged;
    the spine covers the full observed range."""
    from etl_for_ecol_fusion_database_spark.operators import text as _  # noqa: F401

    rows = []
    eid = 0
    for day, n in [(1, 100), (2, 100), (4, 100), (5, 3)]:  # day 3 missing
        for i in range(n):
            rows.append((eid, f"2024-01-0{day} 12:{i % 60:02d}:00"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.createOrReplaceTempView("_pc_events")
    daily = df.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spine = df.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    ).select(F.explode(F.sequence("d0", "d1")).alias("day"))
    stats = daily.agg(F.round(F.avg("n_events"), 6).alias("mean_n"))
    out = {
        str(r.day): r.status
        for r in spine.join(daily, "day", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "day",
            F.when(F.col("n_events").isNull(), F.lit("missing"))
            .when(F.col("n_events") < 0.5 * F.col("mean_n"), F.lit("short"))
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
        .collect()
    }
    assert out["2024-01-03"] == "missing"
    assert out["2024-01-05"] == "short"
    assert out["2024-01-01"] == "ok" and len(out) == 5


def test_partition_completeness_registry_shape(spark, sf_dir):
    out = QUERIES["x12_partition_completeness"](spark, sf_dir).collect()
    days = sorted(str(r.day) for r in out)
    # contiguous daily spine over the observed range, no duplicates
    assert len(days) == len(set(days))
    assert all(r.n_events >= 0 for r in out)
    assert {r.status for r in out} <= {"ok", "short", "missing"}


def test_dataset_card_totals_consistent(spark, sf_dir):
    """Card totals must reconcile with direct corpus-wide counts."""
    card = QUERIES["x12_dataset_card"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in card) == docs.count()
    assert sum(r.total_chars for r in card) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    for r in card:
        assert 0 <= r.docs_in_dup_groups <= r.n_docs
        assert r.n_unique_texts <= r.n_docs
        assert 0.0 <= r.mean_quality <= 1.0


# ---------------------------------------------------------------------------
# OOV rate / skew report
# ---------------------------------------------------------------------------


def test_oov_rate_bounds_and_consistency(spark, sf_dir):
    out = QUERIES["x3_oov_rate"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - round(r.n_oov / r.n_tokens, 6)) < 1e-9
    # the top-100 vocabulary must cover SOME tokens somewhere
    assert any(r.n_oov < r.n_tokens for r in out)


def test_skew_report_identifies_heaviest_key(spark, sf_dir):
    out = sorted(QUERIES["x13_skew_report"](spark, sf_dir).collect(), key=lambda r: r.rank)
    e = load_table(spark, sf_dir, "events")
    counts = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    heaviest = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
    assert out[0].hot_key == heaviest[0] and out[0].n_rows_key == heaviest[1]
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    # ranked descending by volume; skew factor consistent with the mean
    vols = [r.n_rows_key for r in out]
    assert vols == sorted(vols, reverse=True)
    mean = sum(counts.values()) / len(counts)
    assert abs(out[0].skew_factor - round(out[0].n_rows_key / round(mean, 6), 6)) < 1e-4

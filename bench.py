#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads:
- the flagship validity pipeline and the fusion ETL transform (SURVEY.md §3.3)
- aggregation / star-join analytics (q1, q5)
- the ingest-shaped copy the reference actually measured (BASELINE.md:
  read -> type-map transform -> write parquet; reference best = 2,600 rows/s)
- extension operators (dedup, text analysis, similarity) as they land
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: registry queries timed by the harness (each run materialized via the
#: mode in MATERIALIZE below)
HEADLINE = [
    "flagship_valid_cohort",
    "fusion_etl_collisions",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_star_join_revenue",
    "q18_large_orders",
    "j2_w1_status_rank",
    "a4_argmax_latest_event",
    # extension operators (present from round 1+; keep list in sync with registry)
    "asof_last_purchase",
    "x1_dedup_exact_docs",
    "x3_text_quality",
    "x3_lang_id",
    "x2_cosine_topk",
    "x1_minhash_near_dup",
    # round 2+: keep earlier keys stable for round-over-round comparison,
    # append new coverage at the end
    "flagship_valid_flag_cohort",
    "x2_lsh_bucketed_ann",
    "x5_sliding_counts",
    "x1_training_data_prep",
    "x3_vocab_topk",
    "q6_revenue_delta",
    "q13_customer_distribution",
    "x3_repetition_signals",
    "x6_hash_split",
    "x7_scd2_status_intervals",
    # round 2: TPC-H completion + curation operators
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "x1_dup_clusters",
    "x6_decontaminate",
    "x6_pack_shards",
    "x3_tfidf_top_terms",
    "x8_kmeans_clusters",
    # round 2 late additions: gap fill, interval join, grouped-UDAF median,
    # CUBE, fuzzy matching
    "x5_gap_fill_hourly",
    "x5_view_click_attribution",
    "x3_grouped_median",
    "a7_cube_summary",
    "f9_levenshtein_match",
    "x10_cdc_merge",
    "x3_ngram_lm_score",
    # round 2 final additions: funnel/retention analytics, RAG chunking,
    # quantized ANN, point-in-time join
    "x5_funnel_steps",
    "x5_retention_cohorts",
    "x3_doc_chunks",
    "x2_quantized_topk",
    "j9_point_in_time",
    "a8_mad_anomaly",
    "x3_quality_threshold_filter",
    "x1_chunk_dedup",
    "x11_incremental_rollup",
    "a9_grouping_sets",
    # round 3: portable-hash dedup witnesses, media decode plumbing,
    # domain mixture, Z-order layout
    "x1_minhash_portable",
    "x4_media_decode",
    "x6_domain_mixture",
    "x9_zorder_layout",
    "x5_interval_overlap",
    "x12_data_quality",
    "x13_salted_agg",
    "x1_dedup_longest_survivor",
    "x3_inverted_index",
    "x11_countmin_freq",
    "x3_bm25_topk",
    "x2_hybrid_rrf",
    "x10_snapshot_diff",
    "x3_char_entropy",
    "x8_kmeans_assign",
    "x2_lsh_portable",
    "x9_curation_v2",
    "x12_column_profile",
    # round 4: streaming replay witness, re-oracled sketch accuracy report,
    # PQ encoding, corpus statistics, drift monitoring
    "x5_stream_curation_replay",
    "x3_profile_sketch",
    "x2_pq_encode",
    "x3_zipf_slope",
    "x12_drift_psi",
    "x1_semdedup",
    "x11_hll_accuracy",
    "x6_curriculum_buckets",
    "x3_gopher_rules",
    "x3_dsir_logweights",
    "x2_pq_adc_topk",
    "x10_scd2_apply",
    "x6_concat_chunks",
    "x2_ivf_pq_ann",
    "x12_partition_completeness",
    "x12_dataset_card",
    "x3_oov_rate",
    "x13_skew_report",
    # round 4b: Bloom decontamination, kNN self-join, format round-trips,
    # per-key sampling
    "x1_bloom_decontaminate",
    "x2_knn_join",
    "s19_csv_roundtrip",
    "s20_orc_roundtrip",
    "x6_per_key_sample",
    "x3_hashing_features",
    "x1_cdc_chunks",
    "x6_epoch_shuffle",
    "x2_random_projection",
    "s21_jsonl_corrupt_records",
    "s22_schema_evolution",
    "x9_curation_v3",
    "s23_binaryfile_scan",
    "x2_index_persist",
    "x1_incremental_dedup",
    "x3_bpe_pair_counts",
    "x4_media_resize",
    "x11_hll_intersection",
    "x7_asof_status_rollup",
    "x2_group_centroids",
    "x6_negative_pairs",
    "x6_shard_manifest",
    "a11_winsorize",
    "x11_running_distinct",
    "x2_mmr_rerank",
    "x12_class_balance",
    "x1_minhash_accuracy",
    "s24_partition_pruned_read",
    "x5_trending_topk",
    "x1_dup_explain",
    "x8_kmeans_elbow",
    "j10_abandoned_views",
    # round 6: codegen JL-projection twin (vs the portable fold above)
    "x2_random_projection_fast",
    # round 12: incremental near-dup gate against the signature store;
    # duplicated-substring spans (Lee et al. substring-level dedup)
    "x1_incremental_minhash",
    "x1_duplicated_spans",
    # round 13: span removal + curation v4 (the apply half of substring
    # dedup), signature-store upsert/compaction, greedy BPE encode
    "x1_span_scrub",
    "x9_curation_v4",
    "x1_minhash_store_update",
    "x3_bpe_encode",
    "x6_bpe_budget_pack",
]

#: FIXED inline panel for the stdout JSON line (VERDICT r08 item #5).
#: When the line exceeds the driver's 2000-char tail capture even at
#: integer precision, earlier rounds kept the 50 SLOWEST queries — a
#: selection that swapped members between rounds (x12_column_profile /
#: x3_bm25_topk out, x3_hashing_features / s22_schema_evolution in at
#: r08), making the sheet-over-sheet headline a moving basket.  The
#: basket is now pinned at exactly the round-8 inline membership
#: (BENCH_r08.json order, slowest-first as measured then), asserted
#: against that committed sheet by tests/test_doc_counts.py; the full
#: per-query detail always lands in BENCH_RESULTS.json regardless.
PINNED_PANEL = [
    "x3_profile_sketch", "x2_random_projection", "x2_index_persist",
    "x1_semdedup", "x2_ivf_pq_ann", "x8_kmeans_clusters",
    "x1_dup_clusters", "x1_cdc_chunks", "x8_kmeans_elbow",
    "x9_curation_v3", "x1_minhash_accuracy", "x1_minhash_near_dup",
    "ingest_copy", "x2_quantized_topk", "x3_ngram_lm_score",
    "x2_pq_adc_topk", "x2_knn_join", "x1_minhash_portable",
    "x5_stream_curation_replay", "flagship_valid_cohort",
    "x2_lsh_bucketed_ann", "x1_training_data_prep", "x2_lsh_portable",
    "fusion_etl_collisions", "x2_pq_encode", "q18_large_orders",
    "q2_min_cost_supplier", "x12_data_quality", "x3_bpe_pair_counts",
    "q3_shipping_priority", "s24_partition_pruned_read",
    "x6_decontaminate", "x3_tfidf_top_terms",
    "x3_quality_threshold_filter", "x1_bloom_decontaminate",
    "x2_hybrid_rrf", "x2_mmr_rerank", "x1_dup_explain",
    "q5_star_join_revenue", "q21_waiting_supplier",
    "flagship_valid_flag_cohort", "q9_product_profit", "x2_cosine_topk",
    "x10_scd2_apply", "x3_hashing_features", "j2_w1_status_rank",
    "x10_cdc_merge", "x9_curation_v2", "s22_schema_evolution",
    "x3_grouped_median",
]

#: materialization used for every timed run.  "noop" (default, round 11+)
#: writes to Spark's built-in no-op sink: every output column is fully
#: computed and the plan cannot be pruned.  "count" (rounds 1-10) is kept
#: for protocol-continuity comparisons, but UNDER-measures aggregate-shaped
#: queries: Catalyst prunes aggregate-function evaluation under count()
#: (q1_pricing_summary 0.36 s count vs 2.28 s noop at sf0.1; a bare 1-row
#: aggregate prunes to a zero-column scan — docs/PROBE_PROFILE_SKETCH_r11
#: .json).  The JSON line carries the mode so sheets are never compared
#: across protocols.
MATERIALIZE = os.environ.get("SPARK_GRAFT_MATERIALIZE", "noop").strip().lower()
if MATERIALIZE not in ("noop", "count"):
    # fail fast: a typo'd mode would silently run noop while the JSON line
    # records the raw string — a sheet labeled with a mode never exercised
    sys.exit(
        f"SPARK_GRAFT_MATERIALIZE must be 'noop' or 'count', got "
        f"{os.environ['SPARK_GRAFT_MATERIALIZE']!r}"
    )


def _materialize(df) -> None:
    if MATERIALIZE == "count":
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()


#: timed runs per query; the reported figure is the MEDIAN.  Round-4/5
#: single-shot timings produced ±0.5 s phantom swings in both directions
#: from run-order noise alone; the median of 3 makes two consecutive bench
#: invocations agree per-query instead of flagging ghosts.
N_RUNS = 3

#: the embedding-head queries allocate enough JVM heap (broadcast distance
#: tables, codebooks, Arrow batches) that a stop-the-world GC landing inside
#: one timed run inflates it ~3x — the committed r6 detail shows raw runs
#: [3.94, 11.68, 5.31] for x2_ivf_pq_ann, poisoning even the median-of-3.
#: These queries get (a) an explicit System.gc() barrier BEFORE each timed
#: run, so collections triggered by earlier queries' garbage are paid
#: outside the timing window, and (b) median-of-5, so one residual outlier
#: can never reach the median (round-6 VERDICT item #3).
HEAVY_HEAD = frozenset(
    {
        "x2_ivf_pq_ann",
        "x2_index_persist",
        "x1_semdedup",
        "x3_profile_sketch",
        "x2_pq_adc_topk",
        "x8_kmeans_clusters",
        "x2_knn_join",
        "x2_random_projection",
        # round 13 (VERDICT r12 item #3): the spans finder is the slowest
        # sf0.1 query (4.1 s) and its scrub superset inherits the plan
        "x1_duplicated_spans",
        "x1_span_scrub",
    }
)
N_RUNS_HEAVY = 5

#: uncounted full-SF warm-up runs for each HEAVY_HEAD query (see the
#: in-loop comment; round-8, VERDICT r07 item #5).  Raised 2 -> 4 in
#: round 9: a 14-run idle probe of x1_semdedup showed the first TWO
#: full-SF runs systematically hot (6.42, 5.41, then settling at
#: 4.7 +/- 0.3 — tiered JIT on this plan needs more executions than the
#: smoke warm-up reaches), so with only 2 uncounted runs the hot tail
#: still landed inside the timed window (r08 raw spread 31%); after 4
#: total executions the residual spread measured 13.8%, inside the 15%
#: done-bar (VERDICT r08 item #4).
HEAVY_WARMUP_RUNS = 4


def _cpu_calibration() -> float:
    """Single-thread CPU calibration: seconds for 1M chained sha256 digests.

    Rounds run on different VMs/hosts; the r11 count-protocol panel
    measured a uniform ~1.23x median slowdown vs r09 on UNTOUCHED
    queries — hardware drift, not code.  A fixed pure-CPU workload
    recorded with every sheet lets cross-round comparisons normalize
    out the machine instead of mis-attributing it to the engine."""
    import hashlib

    x = b"calibration"
    t0 = time.perf_counter()
    for _ in range(1_000_000):
        x = hashlib.sha256(x).digest()
    return round(time.perf_counter() - t0, 3)


def _gc_barrier(spark) -> None:
    """Force a JVM collection outside the timing window (best-effort)."""
    try:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.2)
    except Exception:
        pass


#: full per-query detail (timings at 3dp, shuffle bytes, errors) is written
#: here — the stdout JSON line must stay under the driver's 2000-char tail
#: capture (the r03 line was ~2.7k chars and lost its head), so it carries
#: 2dp timings only and the rest lives in this file.
DETAIL_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULTS.json")


def _shuffle_totals(spark) -> tuple[int, int] | None:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all stages.

    Uses the always-on AppStatusStore (the structure behind the Spark UI /
    REST API) via py4j; per-query deltas of these totals give the shuffle
    volume each benchmark query moved.  Returns None if the internal API
    shape ever changes — shuffle metrics are best-effort evidence, never a
    reason to lose the timings.
    """
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jvm = sc._jvm
        darr = sc._gateway.new_array(jvm.double, 0)
        stages = store.stageList(
            jvm.java.util.ArrayList(), False, False, darr, jvm.java.util.ArrayList()
        )
        read = write = 0
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            read += s.shuffleReadBytes()
            write += s.shuffleWriteBytes()
        return read, write
    except Exception:
        return None


def main() -> None:
    from etl_for_ecol_fusion_database_spark import registry
    from etl_for_ecol_fusion_database_spark.catalog import load_table
    from etl_for_ecol_fusion_database_spark.session import get_spark
    from pyspark.sql import functions as F

    # retain enough stage history that cumulative shuffle totals never shrink
    # mid-run (eviction would make per-query deltas negative)
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # machine-load telemetry (VERDICT r10 item #5): the driver sheet runs on
    # a possibly-contended machine while the committed idle panels do not,
    # and a +6% sheet vs -10% idle divergence cost the r10 verdict an hour
    # of disambiguation.  Recording the 1/5/15-min load averages before and
    # after the run makes every sheet carry its own contention evidence.
    try:
        load_pre = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_pre = None
    cal_sec = _cpu_calibration()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    shuffle_bytes: dict[str, dict[str, int]] = {}

    # warm the JVM once (codegen, shuffle + window machinery) — not counted
    from pyspark.sql.window import Window

    warm = load_table(spark, SF_DIR, "nation")
    warm.groupBy("n_regionkey").count().withColumn(
        "rn", F.row_number().over(Window.partitionBy("n_regionkey").orderBy("count"))
    ).count()

    # per-query warmup at the smoke scale: compiles the query's generated
    # code and plan shapes once, so the measured number is steady-state
    # EXECUTION time — the quantity that scales with data volume — rather
    # than first-run whole-stage-codegen compilation (a fixed few seconds
    # that is pure noise against a 100 TB run).
    warm_dir = "/root/testdata/sf0.001"
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        if os.path.isdir(warm_dir) and warm_dir != SF_DIR:
            try:
                _materialize(fn(spark, warm_dir))
            except Exception:
                pass
        # one broken query must not void the whole bench (a round-2 bench
        # produced NO data because a single query raised): record the error,
        # keep timing the rest, surface everything in the JSON line.
        # N_RUNS timed runs, median reported; shuffle deltas bracket the
        # first run only (per-run shuffle volume is deterministic).
        # the heavy heads additionally get uncounted warm-up runs AT THE
        # MEASURED SF: their r07 raw runs ([8.7, 8.4, 6.1, 6.2, 6.2] for
        # x3_profile_sketch) show the first TWO full-scale runs ~40% hot
        # even after the sf0.001 warm-up and GC barrier — tiered JIT on the
        # Expand/percentile subtrees plus first-touch page cache at sf0.1,
        # neither of which the smoke-scale pass reaches.  Steady-state is
        # the quantity that scales with data volume (VERDICT r07 item #5:
        # raw-run spread <= 15% for every heavy head).
        if name in HEAVY_HEAD:
            for _ in range(HEAVY_WARMUP_RUNS):
                try:
                    _gc_barrier(spark)
                    _materialize(fn(spark, SF_DIR))
                except Exception:
                    break
        runs: list[float] = []
        failed = False
        before = _shuffle_totals(spark)
        n_runs = N_RUNS_HEAVY if name in HEAVY_HEAD else N_RUNS
        for i in range(n_runs):
            if name in HEAVY_HEAD:
                _gc_barrier(spark)
            t0 = time.perf_counter()
            try:
                _materialize(fn(spark, SF_DIR))
            except Exception as exc:  # noqa: BLE001 - report, don't die
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                failed = True
                break
            runs.append(round(time.perf_counter() - t0, 3))
            if i == 0:
                after = _shuffle_totals(spark)
                if before is not None and after is not None:
                    shuffle_bytes[name] = {
                        "read": max(0, after[0] - before[0]),
                        "write": max(0, after[1] - before[1]),
                    }
        if failed:
            # a later-run failure must not leave orphan shuffle data for a
            # query that has no timings entry (consumers join the two maps)
            shuffle_bytes.pop(name, None)
            continue
        all_runs[name] = runs
        timings[name] = sorted(runs)[len(runs) // 2]
        # ADVICE r12: under SPARK_GRAFT_BARRIER=persist each barriered
        # query leaks one DISK_ONLY cached relation the query author can't
        # release; drop them between queries so a long panel doesn't
        # accumulate session-lifetime disk.  No-op in the default local
        # mode (localCheckpoint blocks are not cache-manager entries).
        if os.environ.get("SPARK_GRAFT_BARRIER", "").strip().lower() == "persist":
            spark.catalog.clearCache()

    # ingest-shaped copy (BASELINE.md): read the two biggest tables, apply the
    # fusion-style transform (lineage lit + derived cols), write parquet.
    out_dir = tempfile.mkdtemp(prefix="bench_ingest_")
    t0 = time.perf_counter()
    n_rows = 0
    for tbl in ("lineitem", "orders"):
        df = load_table(spark, SF_DIR, tbl)
        df = df.withColumn("source", F.lit("eCollision Oracle"))
        df.write.mode("overwrite").parquet(f"{out_dir}/{tbl}")
        n_rows += spark.read.parquet(f"{out_dir}/{tbl}").count()
    ingest_sec = round(time.perf_counter() - t0, 3)
    timings["ingest_copy"] = ingest_sec
    shutil.rmtree(out_dir, ignore_errors=True)

    try:
        load_post = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_post = None

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    rows_per_sec = round(n_rows / ingest_sec) if ingest_sec else None

    # provenance (VERDICT r11 item #5: every committed measurement artifact
    # self-describes its source commit and tree state)
    import subprocess

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        git_head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
        # BENCH_RESULTS.json is this instrument's own output — a previous
        # run's overwrite must not mark the next run's tree dirty.  The
        # exclusion is a git pathspec (ADVICE r12), not string-slicing of
        # porcelain lines: slicing misclassified rename entries
        # ("R  old -> new") and quoted paths.
        porcelain = subprocess.run(
            ["git", "status", "--porcelain", "--", ".",
             ":(exclude)BENCH_RESULTS.json"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        ).stdout
        git_dirty = bool(porcelain.strip())
    except Exception:
        git_head, git_dirty = None, None

    # full-precision detail (incl. per-query shuffle bytes) → side file; the
    # driver's tail capture only keeps the last 2000 chars of stdout
    detail = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs_per_query": N_RUNS,
        "runs_per_query_heavy": N_RUNS_HEAVY,
        # authoritative per-query protocol (ADVICE r07: the flat
        # runs_per_query field is wrong for the HEAVY_HEAD queries, which
        # run N_RUNS_HEAVY times behind a GC barrier since round 7)
        "runs_by_query": {k: len(v) for k, v in all_runs.items()},
        "heavy_head_queries": sorted(HEAVY_HEAD),
        "heavy_head_warmup_runs": HEAVY_WARMUP_RUNS,
        "all_runs": all_runs,
        "shuffle_bytes": shuffle_bytes,
        "sf": sf_val,
        "ingest_rows": n_rows,
        "ingest_rows_per_sec": rows_per_sec,
        "materialize": MATERIALIZE,
        "cal_sha256_1m_sec": cal_sec,
        "loadavg_pre": load_pre,
        "loadavg_post": load_post,
        "cpu_count": os.cpu_count(),
        "git_head": git_head,
        "git_dirty": git_dirty,
        "errors": errors,
    }
    try:
        with open(DETAIL_FILE, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass

    # stdout contract: ONE parseable JSON line, guaranteed to fit inside the
    # driver's 2000-char tail capture (nothing else prints to stdout, so the
    # whole line survives as long as it is < ~1990 with its newline).
    # Degrade precision (2dp → 1dp) before ever dropping per-query data;
    # full 3dp detail is always in BENCH_RESULTS.json next to this script.
    payload = {
        "metric": "headline_wall",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf_val,
        "ingest_rps": rows_per_sec,
        "mat": MATERIALIZE,
        "cal": cal_sec,
        # 1-min load average at start/end: a pre-load near cpu_count means
        # the sheet ran contended and its timings are not comparable to the
        # committed idle panels (BASELINE.md noise-floor protocol)
        "load1_pre": load_pre[0] if load_pre else None,
        "load1_post": load_post[0] if load_post else None,
        "git": (git_head[:10] + ("+dirty" if git_dirty else "")) if git_head else None,
    }
    if errors:
        payload["errors_count"] = len(errors)
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1990:
        payload["queries"] = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1990:
        # keep EVERY query present at integer seconds (names + coarse cost
        # still compare round-over-round; 3dp detail is in the file)
        payload["queries"] = {k: int(round(v)) for k, v in timings.items()}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1990:
        # last resort: keep the PINNED panel inline (fixed basket —
        # sheet-over-sheet headlines compare the same work), rest in file
        top = {k: timings[k] for k in PINNED_PANEL if k in timings}
        payload["queries"] = {k: round(v, 1) for k, v in top.items()}
        payload["queries_truncated"] = len(timings) - len(top)
        line = json.dumps(payload, separators=(",", ":"))
    spark.stop()
    print(line)
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()

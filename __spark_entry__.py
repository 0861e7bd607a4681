"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``etl_for_ecol_fusion_database_spark``; this module
only adapts that package to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_for_ecol_fusion_database_spark import registry
from etl_for_ecol_fusion_database_spark.session import pin_parity_conf

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.3 valid-collision pipeline) on
    /root/testdata/sf0.001; driver checks rows>0."""
    pin_parity_conf(spark)
    return registry.QUERIES["flagship_valid_cohort"](spark, SF_SMOKE_DIR)


# Names that already have a driver CORRECTNESS row (union of the r01-r03
# sheets).  The driver samples only the FIRST 50 entries of queries() per
# round, so we rotate: never-witnessed entries (the whole TPC-H suite and the
# late registry_ext operators) go first, already-witnessed ones go last.
# Every registered query is still present — only the order changes.
_WITNESSED_R01_R03 = frozenset({
    "a1_earliest_status_date", "a3_counts", "a4_argmax_latest_event",
    "asof_last_purchase", "f3_case_year", "flagship_valid_cohort",
    "flagship_valid_cohort_sql", "flagship_valid_flag_cohort",
    "fusion_etl_collisions", "j1_with_cutoff", "j2_w1_status_rank",
    "j4_semi_filter", "j5_anti_orphan_customers", "j6_decode_chain",
    "o1_sort_desc", "o3_top_n", "p11_valid_flag", "p6_negative_id_cohort",
    "q13_customer_distribution", "q18_large_orders", "q1_pricing_summary",
    "q3_shipping_priority", "q4_priority_exists", "q5_star_join_revenue",
    "q6_revenue_delta", "u1_cutoff_dim", "w2_p10_latest_status",
    "x1_dedup_exact_docs", "x1_dedup_exact_events", "x1_embedding_near_dup",
    "x1_minhash_near_dup", "x1_minhash_portable", "x1_ngram_jaccard_pairs",
    "x1_simhash_near_pairs", "x1_simhash_portable", "x1_training_data_prep",
    "x2_cosine_topk", "x2_embedding_norms", "x2_ivf_ann", "x2_ivf_full_probe",
    "x2_lsh_bucketed_ann", "x3_fingerprint", "x3_fingerprint_portable",
    "x3_fingerprint_rolling", "x3_lang_id", "x3_length_histogram",
    # x3_profile_sketch deliberately absent: its only driver row was a
    # rows-only "no_oracle" — round 4 gave it a real oracle, so it re-enters
    # the unwitnessed block to earn a hash-checked row
    "x3_profile_lineitem", "x3_text_quality",
    "x3_token_counts", "x3_vocab_topk", "x4_binary_meta", "x4_json_props",
    "x4_media_decode", "x4_media_meta_summary", "x5_session_windows",
    "x5_tumbling_hourly",
})


def _rotated_names() -> list[str]:
    """Registration order, partitioned so unwitnessed entries come first.

    Within the unwitnessed block: TPC-H queries first (the entire suite is
    unwitnessed), then oracle-backed ext entries in registration order, then
    rows-only entries (weaker driver check — spend sample slots on the
    hash-checkable ones first).
    """
    priority = [
        # named in VERDICT.md round-3 "done" criterion — must land in the
        # sample window this round
        "x9_curation_v2", "x12_data_quality", "x3_bm25_topk",
        "x8_kmeans_assign",
        # round-4 streaming witness: the one entry whose Spark side runs the
        # actual writeStream path (VERDICT round-3 item #8)
        "x5_stream_curation_replay",
    ]
    names = list(registry.QUERIES)
    unseen = [
        n for n in names
        if n not in _WITNESSED_R01_R03 and n not in priority
    ]
    seen = [n for n in names if n in _WITNESSED_R01_R03]
    unseen = priority + unseen
    tpch = [n for n in unseen if n.startswith("q") and n[1].isdigit()]
    rest_oracled = [
        n for n in unseen if n not in tpch and n in registry.ORACLES
    ]
    rest_rows_only = [
        n for n in unseen if n not in tpch and n not in registry.ORACLES
    ]
    return tpch + rest_oracled + rest_rows_only + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's 50-entry sample window hits queries that do not
    yet have a CORRECTNESS row (see _rotated_names)."""
    return {n: registry.QUERIES[n] for n in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each ``queries()`` key.
    Keys absent here (non-SQL-expressible ops, e.g. LSH/simhash/streaming)
    get the driver's weaker rows-only check."""
    return dict(registry.ORACLES)

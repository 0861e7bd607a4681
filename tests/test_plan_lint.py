"""Repo-wide physical-plan lint: every registered query's plan is swept
for the antipatterns that kill jobs at 100 TB.

Unlike tests/test_plan_quality.py (deep pins on specific showcase
queries), this is a breadth gate over the WHOLE registry: a newly added
query that sneaks in a cartesian product, a row-at-a-time Python UDF, or
an unbounded single-partition window fails here even if nobody wrote it
a dedicated plan test.

Intentional exceptions are allowlisted *with the reason they are safe*;
an allowlist entry for a query that stops exhibiting the pattern is
flagged too, so the list cannot rot.
"""

from __future__ import annotations

import re

import pytest

from etl_for_ecol_fusion_database_spark import registry

# BroadcastNestedLoopJoin is the correct physical op when one side is a
# bounded broadcast relation and the condition is non-equi.  Each entry
# documents why the build side stays small AT ANY DATA SCALE.
BNLJ_OK = {
    "x2_cosine_topk": "20 broadcast query vectors vs corpus (bounded probe set)",
    "x2_ivf_ann": "broadcast centroid set (16 rows)",
    "x2_ivf_full_probe": "broadcast centroid set (16 rows)",
    "x1_embedding_near_dup": "bounded ground-truth oracle (id-range capped, documented)",
    "x3_ngram_lm_score": "1-row corpus-total relation crossed in",
    "x3_quality_threshold_filter": "1-row percentile-threshold relation crossed in",
    "q22_sales_opportunity": "1-row AVG scalar subquery crossed in (TPC-H shape)",
    "x6_domain_mixture": "1-row normalization-total relation crossed into the |domains|-row rate table",
    "x3_bm25_topk": "1-row corpus-stats relation (n_docs, avgdl) crossed into the query-term tf rows",
    "x2_hybrid_rrf": "composes bm25_scores (same 1-row stats cross) for the sparse side",
    "x9_curation_v2": "composes domain_mixture (same 1-row normalization-total cross)",
    "x3_profile_sketch": "two 1-row aggregate results (cardinalities x percentiles) cross-joined",
    "x6_curriculum_buckets": "1-row quartile-threshold relation crossed into the bucketing projection",
    "x3_dsir_logweights": "1-row bigram-totals relation crossed into the 256-row bucket log-ratio table",
    "x2_pq_adc_topk": "10 broadcast query distance-table rows crossed into the PQ-code relation (bounded probe set)",
    "x12_partition_completeness": "1-row mean-volume relation crossed into the |days|-row spine join",
    "x13_skew_report": "1-row key-stats relation crossed into the post-limit 5-row hot-key relation",
    "x11_hll_intersection": "five 1-row aggregate/sketch-estimate results cross-joined into the report row",
    "x6_negative_pairs": "1-row corpus-size scalar crossed into the anchor projection",
    "x2_mmr_rerank": "composes brute_force_topk (10 broadcast query vectors vs corpus, bounded probe set)",
    "x12_class_balance": "1-row totals relation crossed into the |classes|-row count table",
    "x1_incremental_dedup": "1-row max-doc_id split-point relation crossed in (replaced the round-4 driver-side collect)",
    "s22_schema_evolution": "1-row max-doc_id split-point relation crossed into each batch write (replaced the round-4 driver-side collect)",
}

# A single-partition exchange feeding a Window is only safe when the
# windowed relation is provably tiny (post-aggregation scalars or
# bucket-count-sized).
GLOBAL_WINDOW_OK = {
    "x6_pack_shards": "window runs over per-bucket offsets (n_buckets rows)",
    "x6_bpe_budget_pack": "composes pack_shards (same bucket-offset window)",
    "x9_curation_pipeline": "composes pack_shards (same bucket-offset window)",
    "q11_important_value": "window over the post-aggregation partkey sums for ranking (TPC-H scalar-threshold shape)",
    "q15_top_supplier": "window over per-supplier revenue aggregate (|suppliers| rows, post-agg)",
    "q17_small_qty_revenue": "per-part avg window over the aggregated part set",
    "x2_hybrid_rrf": "rank window over a post-top-k relation (<= 50 rows by construction)",
    "x3_zipf_slope": "rank window over the top-1000 vocabulary head (bounded by the preceding limit)",
    "x12_drift_psi": "bin-totals window over the 10-row post-aggregation bin table",
    "x6_concat_chunks": "bucket-offset window over per-bucket totals (n_buckets rows), same shape as pack_shards",
    "x6_epoch_shuffle": "range-offset window over per-hash-range totals (n_buckets=64 rows), same shape as pack_shards",
    "x9_curation_v3": "composes epoch_shuffle (same 64-row range-offset window)",
    "x6_shard_manifest": "composes pack_shards (same bucket-offset window over per-bucket totals)",
    "x13_skew_report": "rank window over the post-limit 5-row hot-key relation",
    "x11_running_distinct": "running-sum window over the |days|-row per-day aggregate, never the event data",
    "x5_funnel_steps": "windows hash-partition on user_id (per-step minima); the SinglePartition exchange is the 4-value final counts row, not a window input",
}


def _static_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_scale_antipatterns(spark, sf_dir, name):
    plan = _static_plan(registry.QUERIES[name](spark, sf_dir))

    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    # row-at-a-time Python UDFs never belong in a data path (Arrow forms
    # ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas are fine)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"

    has_bnlj = "BroadcastNestedLoopJoin" in plan
    if has_bnlj:
        assert name in BNLJ_OK, (
            f"{name}: BroadcastNestedLoopJoin without a documented bounded "
            "build side — add to BNLJ_OK with a justification if intended"
        )

    has_gw = bool(
        re.search(r"Exchange SinglePartition", plan) and "Window" in plan
    )
    if has_gw:
        assert name in GLOBAL_WINDOW_OK, (
            f"{name}: single-partition exchange + window — only safe on "
            "provably-tiny relations; add to GLOBAL_WINDOW_OK with a reason"
        )

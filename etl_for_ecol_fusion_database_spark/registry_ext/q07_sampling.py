"""X6 deterministic dataset splits & sampling — split from the single-module registry_ext (round 6).

Registration order is load-bearing (the __spark_entry__ witness rotation
samples in registration order): registry_ext/__init__.py imports the
block modules in the original file's order and entries within each module
keep their original sequence — append, don't reorder.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ..catalog import load_table  # noqa: F401
from ..operators import dedup, multimodal, sampling, similarity, text  # noqa: F401
from ..registry import query  # noqa: F401
from ._shared import (  # noqa: F401
    _LANG_CASE,
    _LANG_GREATEST,
    _LANG_SCORE_SQL,
    _RT_DIRS,
    _SCD2_FULL_RECOMPUTE_ORACLE,
    _STOP_LIST,
    _marker_list,
    _rt_tmpdir,
    _t,
    _with_synthetic_near_dups,
)

# ===========================================================================
# X6 — deterministic dataset splits & sampling (training-data pipelines)
# ===========================================================================


@query(
    "x6_hash_split",
    oracle="""
SELECT doc_id,
       CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT) AS bucket,
       CASE WHEN ((doc_id % 2147483647) * 2654435761) % 1000 < 800 THEN 'train'
            WHEN ((doc_id % 2147483647) * 2654435761) % 1000 < 900 THEN 'val'
            ELSE 'test' END AS split,
       lang
FROM documents
""",
)
def x6_hash_split(spark, sf_dir):
    """X6 deterministic train/val/test split (800/100/100 per-mille) from a
    multiplicative hash of doc_id — a narrow no-shuffle projection, stable
    under repartitioning and incremental appends
    (operators/sampling.py:hash_split)."""
    from ..operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.hash_split(docs, "doc_id").select("doc_id", "bucket", "split", "lang")


@query(
    "x6_stratified_sample",
    oracle="""
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT), doc_id
           ) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= CEIL(n * 0.1)
""",
)
def x6_stratified_sample(spark, sf_dir):
    """X6 exact deterministic stratified sample: 10% per language via
    rank-over-hash (one shuffle; both windows share the lang partitioning).
    Unlike sampleBy (Bernoulli RNG), counts are exact and reproducible
    (operators/sampling.py:stratified_sample)."""
    from ..operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.stratified_sample(docs, "lang", id_col="doc_id", fraction=0.1)


@query(
    "x6_weighted_sample",
    oracle="""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           CAST(n_chars AS DOUBLE)
             / ((CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT) + 1) / 1000.0)
             AS priority
    FROM documents
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY priority DESC, doc_id ASC
    ) AS rn
    FROM keyed
)
SELECT doc_id, lang, n_chars, priority FROM ranked WHERE rn <= 20
""",
)
def x6_weighted_sample(spark, sf_dir):
    """X6 deterministic weighted sample, 20 docs per language, via priority
    sampling (Duffield-Lund-Thorup): priority = n_chars / u with u a
    deterministic hash-uniform; token-heavy docs win proportionally more.
    One shuffle on lang; WindowGroupLimit keeps per-partition top-k
    map-side.  Priorities are single correctly-rounded IEEE divisions, so
    the DuckDB oracle reproduces them bit-for-bit
    (operators/sampling.py:weighted_priority_sample)."""
    from ..operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_priority_sample(
        docs, "n_chars", id_col="doc_id", k=20, group_cols=["lang"]
    )



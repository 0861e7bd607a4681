"""Incremental aggregation maintenance: algebraic partial states that
merge across batches.

The 100 TB pattern behind incremental view maintenance / backfills: never
re-scan history to refresh a rollup.  Keep a per-group STATE of algebraic
aggregates — ``(n, sum, min, max)`` merge losslessly:

    merge(state(A), state(B)) == state(A ∪ B)

so a late-arriving batch updates the rollup by aggregating ONLY the new
rows and merging states (one tiny shuffle on the group key), exactly how
Spark itself splits partial/final aggregation across the shuffle — this
operator lifts that idea to the inter-batch / inter-day level.

Sums accumulate in DECIMAL(38,6) so merge order cannot change results
(float addition is non-associative; decimal is exact), matching the
engine-wide canon convention (registry.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("agg_n", "agg_sum", "agg_min", "agg_max")


def partial_agg_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """One batch's per-group algebraic state.

    NULL semantics: ``agg_n`` is ``count(*)`` (rows, not non-null values),
    so ``finalize_agg_state``'s average divides by ROW count — unlike SQL
    ``AVG`` which excludes NULLs.  This keeps n mergeable as a plain sum
    and matches the registered oracles; pre-filter NULL values upstream if
    SQL AVG semantics are required."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("agg_n"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("agg_sum"),
        F.min(F.col(value_col).cast("double")).alias("agg_min"),
        F.max(F.col(value_col).cast("double")).alias("agg_max"),
    )


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Merge any number of state tables: union + re-aggregate with each
    component's combiner (sum of counts/sums, min of mins, max of maxes).
    Associative and commutative by construction — batches can arrive and
    merge in any order."""
    if not states:
        raise ValueError("need at least one state")
    keys = [c for c in states[0].columns if c not in STATE_COLS]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        F.sum("agg_n").alias("agg_n"),
        F.sum("agg_sum").alias("agg_sum"),
        F.min("agg_min").alias("agg_min"),
        F.max("agg_max").alias("agg_max"),
    )


def finalize_agg_state(state: DataFrame) -> DataFrame:
    """Render a state table for consumers: exact decimal sum cast to
    double, average derived as double-of-exact-sum / count (stable across
    merge orders and engines)."""
    keys = [c for c in state.columns if c not in STATE_COLS]
    return state.select(
        *keys,
        F.col("agg_n").cast("bigint").alias("n"),
        F.col("agg_sum").cast("double").alias("sum_value"),
        F.round(
            F.col("agg_sum").cast("double") / F.col("agg_n").cast("double"), 6
        ).alias("avg_value"),
        F.col("agg_min").alias("min_value"),
        F.col("agg_max").alias("max_value"),
    )


def hll_state(
    df: DataFrame, keys: Sequence[str], distinct_col: str, *, lg_k: int = 12
) -> DataFrame:
    """Sketch analogue of ``partial_agg_state`` for COUNT(DISTINCT):
    a per-group Datasketches HLL binary.  Unlike exact distinct counts —
    which do NOT merge (|A ∪ B| ≠ |A| + |B|) — sketches merge: union_agg
    over per-batch sketches estimates the union at the same lgK accuracy
    as sketching it directly, at O(2^lg_k) bytes per group instead of
    O(distinct).  Merge is BIT-identical only while the sketches stay in
    exact coupon (LIST/SET) mode — small per-group cardinality; once a
    sketch promotes to dense HLL_4 registers the union-vs-direct states
    legitimately drift within the sketch's error bound (observed 0.7%
    relative at 1500 distincts/group, lgK=12).  Both regimes are pinned
    in tests/test_analytics_ops.py; the registered witness
    (x11_hll_incremental) asserts the any-scale bounded-drift form."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("hll_sk")
    )


def merge_hll_states(*states: DataFrame) -> DataFrame:
    if not states:
        raise ValueError("need at least one state")
    keys = [c for c in states[0].columns if c != "hll_sk"]
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        F.hll_union_agg("hll_sk").alias("hll_sk")
    )


def finalize_hll_state(state: DataFrame) -> DataFrame:
    keys = [c for c in state.columns if c != "hll_sk"]
    return state.select(
        *keys,
        F.hll_sketch_estimate("hll_sk").cast("bigint").alias("approx_distinct"),
    )

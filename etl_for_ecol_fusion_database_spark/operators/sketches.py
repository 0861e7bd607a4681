"""Count-min sketch over token streams — the third sketch family beside
the engine's HLL (distinct counting) and KLL (quantiles), covering
point-frequency estimation ("how often does this n-gram/URL/token occur
in 100 TB?") in O(depth x width) space.

Built with the PORTABLE hash family (operators/dedup.portable_hash_expr:
md5-prefix base hash + mod-p universal permutations), so the ENTIRE
sketch — bucket assignment, counts, and min-over-rows estimation — is
pure integer arithmetic an ANSI-SQL oracle replays exactly.  Production
use would swap xxhash64 in for ~2x hashing throughput; the structure is
identical.

Scale shape: the build is posexplode(depth buckets) -> ONE (row, bucket)
aggregation — map-side combine collapses each partition to at most
depth*width partial rows, so the shuffle is bounded by the sketch size,
not the data.  Sketches MERGE by adding counts cell-wise (the property
that makes them incremental-maintenance- and streaming-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _P_PORT, _PORT_A, _PORT_B, portable_hash_expr


def _bucket_exprs(token_col: str, depth: int, width: int) -> list:
    x = portable_hash_expr(token_col)
    return [
        ((x * F.lit(_PORT_A[r]) + F.lit(_PORT_B[r])) % F.lit(_P_PORT) % F.lit(width))
        for r in range(depth)
    ]


def countmin_build(
    occurrences: DataFrame,
    token_col: str = "token",
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch from one row per token OCCURRENCE: returns
    (row, bucket, n) — the dense counter table in long form.

    Pre-aggregates to per-token counts first (round 11): counters are
    additive, so the bucket hash family evaluates once per DISTINCT
    token instead of once per occurrence — hash cost scales with the
    vocabulary, not the corpus, and the map-side combine shrinks the
    (row, bucket) shuffle input the same way.  Counter values are
    identical (integer sums)."""
    counts = occurrences.groupBy(token_col).agg(F.count(F.lit(1)).alias("n"))
    return countmin_build_weighted(
        counts, token_col, "n", depth=depth, width=width
    )


def countmin_build_weighted(
    token_counts: DataFrame,
    token_col: str = "token",
    count_col: str = "n",
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch from pre-aggregated (token, count) rows — the
    shape callers that already hold per-token counts should use, so the
    token stream is scanned exactly once (counters are additive, so
    folding counts is bit-identical to folding occurrences)."""
    exploded = token_counts.select(
        F.col(count_col).alias("_n"),
        F.posexplode(F.array(*_bucket_exprs(token_col, depth, width))).alias(
            "row", "bucket"
        ),
    )
    return exploded.groupBy("row", "bucket").agg(
        F.sum("_n").alias("n")
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for a (small) probe relation: for each
    probe token, min over the depth rows of its bucket counters.  The
    sketch guarantees est >= true; overestimation is bounded by
    (total_occurrences / width) per row with high probability.

    The probe side re-derives buckets with the same hash family and
    equi-joins the sketch on (row, bucket) — broadcast the sketch (its
    size is depth*width rows, data-independent)."""
    pb = probes.select(
        F.col(token_col).alias("token"),
        F.posexplode(F.array(*_bucket_exprs(token_col, depth, width))).alias(
            "row", "bucket"
        ),
    )
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna({"n": 0})
        .groupBy("token")
        .agg(F.min("n").alias("est_count"))
    )

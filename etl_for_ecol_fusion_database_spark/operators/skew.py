"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.SCALE_CONF) handles most skew
at runtime; these manual forms cover the cases AQE cannot — streaming state,
aggregations whose single hot key floods one reducer, or joins where the
skewed side cannot be split because the other side must replicate.

Both operators are pure DataFrame transformations and provably equivalent to
their unsalted forms (tests/test_scale_ops.py asserts equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregation spec entry: output_name -> (kind, input_col); kinds are the
#: algebraic aggregates that re-combine losslessly across salt buckets
_COMBINE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.sum,  # counts combine by summing partial counts
}


def _row_salt(n_salt: int, cols: list[str]) -> Column:
    """Per-row deterministic salt in [0, n_salt): content hash of the whole
    row.  Spreads a hot key even when it is clustered into a single input
    partition (where a partition-id salt would collapse to one value).

    Content-derived on purpose: a position-based salt
    (monotonically_increasing_id) changes across task retries, and a
    nondeterministic expression evaluated before a shuffle is the classic
    SPARK-23207 correctness hazard — a lost executor recomputes its input
    split with DIFFERENT salts than the first attempt, and the shuffle
    then mixes partial aggregates from both assignments.  The row hash is
    a pure function of the data, identical on every attempt.  Trade-off:
    FULL-ROW duplicates share a salt, so a hot key whose rows are exact
    copies still lands on one reducer — dedup first, or add a disambiguating
    column, if that is your skew shape."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)).cast("int")


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    A hot key's rows spread over ``n_salt`` reducers in phase 1; phase 2
    combines ``n_salt`` partial rows per key — bounded work regardless of
    skew.  Only algebraic aggregates (sum/count/min/max) are accepted; they
    recombine exactly.

    The salt is a per-ROW hash (not per-partition): a hot key concentrated
    in one input split — data sorted or pre-partitioned by that key, the
    common clustered-skew case — would get a single salt value from
    ``spark_partition_id()`` and degrade back to the unsalted plan.
    """
    for name, (kind, _col) in aggs.items():
        if kind not in ("sum", "count", "min", "max"):
            raise ValueError(f"{name}: non-algebraic aggregate {kind!r} cannot be salted")
    salted = df.withColumn("_salt", _row_salt(n_salt, df.columns))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(F.lit(1)) if kind == "count" else getattr(F, kind)(col)).alias(
                f"_p_{name}"
            )
            for name, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _COMBINE[kind](f"_p_{name}").alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: the skewed side gets a
    per-partition salt, the small side is replicated ``n_salt`` times, and
    the join key becomes (key, salt) — each hot key's rows land on
    ``n_salt`` reducers instead of one.

    Cost: ``small`` is materialized n_salt times (only viable when it is
    genuinely small — the same regime where broadcast would apply; use this
    form when the small side exceeds the broadcast threshold but a 1-to-n
    replication still fits).

    Only left-preserving joins are accepted: a right/full outer join over
    the replicated small side would emit each unmatched small-side row
    ``n_salt`` times plus spurious null-rows for the salts a matched left
    row did not carry — silently duplicated output."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/semi/anti are "
            "correct — the replicated small side duplicates unmatched rows "
            "under right/full outer joins"
        )
    salted_left = skewed.withColumn("_salt", _row_salt(n_salt, skewed.columns))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_left.join(replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")
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


def _row_salt(n_salt: int) -> Column:
    """Per-row deterministic salt in [0, n_salt): hash of the row's position
    within its split.  Spreads a hot key even when it is clustered into a
    single input partition (where a partition-id salt would collapse to one
    value)."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)).cast("int")


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
    salted = df.withColumn("_salt", _row_salt(n_salt))
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
    replication still fits)."""
    salted_left = skewed.withColumn("_salt", _row_salt(n_salt))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_left.join(replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")
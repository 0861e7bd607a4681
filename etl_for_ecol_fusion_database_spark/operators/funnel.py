"""X5 product-analytics operators over the event log: ordered funnels and
cohort retention.

These are the classic large-scale clickstream rollups a training-data /
analytics pipeline runs next to windowed aggregation (SURVEY.md §2.11's
event-window family).  Both operators are pure DataFrame compositions —
conditional aggregation + self-joins on the entity key — so every stage
stays in whole-stage codegen and the only shuffles are on ``user_id``
(re-used across stages: the funnel's per-step aggregations and joins all
hash-partition on the same key, which AQE plans as one exchange reused).

Scale notes (100 TB): per-user state is bounded (a handful of timestamps),
never a collect_list of the user's raw events; the final step/cohort
rollup output is tiny (steps × 1 rows, weeks × weeks rows), so the last
aggregation is a cheap partial-combine into a single-digit number of
groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel: for each user, step *i+1* counts only if it
    happens at-or-after the user's completion time of step *i*.

    Stage k computes ``t_k = MIN(ts) WHERE type = steps[k] AND ts >= t_{k-1}``
    via one conditional aggregation per step, each joined back on the user
    key.  All joins/aggregations share the ``user_col`` hash partitioning.

    Returns one row per step: ``(step_idx, step, n_users, conversion)``
    where ``conversion`` is the fraction of step-1 users reaching the step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")

    base = events.select(user_col, type_col, ts_col)

    # t_1: earliest occurrence of the first step per user
    reached = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.filter(F.col(type_col) == step)
            .join(reached.select(user_col, f"t_{i - 1}"), user_col)
            .filter(F.col(ts_col) >= F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        reached = reached.join(nxt, user_col, "left")

    counts = reached.agg(
        *[
            F.count(F.col(f"t_{i}")).alias(f"n_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    per_step = [
        counts.select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"n_{i}").alias("n_users"),
            F.round(
                F.col(f"n_{i}").cast("double") / F.col("n_1").cast("double"), 6
            ).alias("conversion"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    out = per_step[0]
    for p in per_step[1:]:
        out = out.unionByName(p)
    return out


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention triangle.

    A user's cohort is the ISO week (``date_trunc('week')``) of their first
    event; each (cohort_week, offset_weeks) cell counts distinct users from
    that cohort active in that later week.  Two shuffles total: the
    first-event groupBy on ``user_col`` (whose partitioning the activity
    join reuses) and the final cohort rollup, whose cardinality is
    O(weeks²) — trivially small at any data scale.
    """
    acts = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("act_week")
    )
    firsts = acts.groupBy(user_col).agg(F.min("act_week").alias("cohort_week"))
    joined = acts.join(firsts, user_col).select(
        user_col,
        "cohort_week",
        (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("offset_weeks"),
    )
    if max_offset is not None:
        joined = joined.filter(F.col("offset_weeks") <= max_offset)
    return (
        joined.groupBy("cohort_week", "offset_weeks")
        .agg(F.countDistinct(user_col).alias("n_active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "offset_weeks",
            "n_active_users",
        )
    )

"""Join operators beyond plain equi-joins — notably the as-of join.

SURVEY.md §2.3 notes the reference's J2+W1 combination ("status history rows
at-or-before the cutoff, keep the latest") *is* an as-of join computed the
expensive way (range join then rank-filter).  This module provides the
direct operator.

Scale design: the classic scalable as-of implementation is the union+window
("merge") form — tag both inputs, union, and take ``last(payload) ignoring
nulls`` over (key, time, side).  ONE shuffle on the key, one sort within
partitions, zero row explosion — versus the range join whose output is
|probe| x |matching quotes| before the rank filter.  This is how kdb/Flink/
QuestDB-style engines do it; Spark expresses it with built-in window
functions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_time`` <= ``left_time`` (same key); NULLs when no such
    row.  ``inclusive=False`` gives strictly-before semantics.

    Implementation: union with a side tag, then ``last(payload, ignorenulls)``
    over (key ORDER BY time, side) — quotes sort before probes at equal
    time when inclusive (so an equal-time quote is visible to the probe),
    after them when exclusive.

    The payload travels as ONE struct column so every output column comes
    from the *same* matched quote row — per-column ``last(ignorenulls)``
    would let a NULL in one payload column fall back to an older quote while
    its siblings came from the newer one (row tearing, diverging from
    ASOF JOIN semantics which preserve the matched row's NULLs).
    """
    quote_side, probe_side = (0, 1) if inclusive else (1, 0)
    lcols = left.columns
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in payload]
    )
    q = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(quote_side).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    p = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(probe_side).alias("_side"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c) for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = q.unionByName(p).select(
        "*", F.last("_p", ignorenulls=True).over(w).alias("_asof")
    )
    return merged.filter(F.col("_side") == probe_side).select(
        *lcols, *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload]
    )


def point_in_time_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    fact_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (temporal interval) join: each fact row picks up the
    dimension interval active at its timestamp —
    ``fact.ts >= valid_from AND (fact.ts < valid_to OR valid_to IS NULL)``.

    This is the lookup side of SCD2 (operators/history.scd2_intervals):
    history tables answer "what was the attribute AS OF this event".

    Plan shape: an equi-join on the entity key with the interval predicate
    evaluated post-join — ONE hash shuffle on ``on`` for both sides.
    Because SCD2 intervals are non-overlapping per key, each fact matches
    at most one interval, so the join never amplifies rows.  At 100 TB the
    key shuffle dominates and co-bucketing both tables on ``on``
    (sources/writers.write_bucketed) removes it entirely.
    """
    iv = intervals.select(
        F.col(on).alias("_k"),
        *[c for c in intervals.columns if c != on],
    )
    cond = (
        (facts[on] == iv["_k"])
        & (facts[fact_time] >= iv[valid_from])
        & (iv[valid_to].isNull() | (facts[fact_time] < iv[valid_to]))
    )
    return facts.join(iv, cond, "left").drop("_k")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    left_keep: list[str] | None = None,
    right_keep: list[str] | None = None,
) -> DataFrame:
    """Join rows whose time intervals OVERLAP ([ls, le] ∩ [rs, re] != ∅,
    closed bounds), without a cartesian product.

    The naive formulation is a pure non-equi join (``ls <= re AND rs <=
    le``), which Spark can only execute as BroadcastNestedLoopJoin — O(n*m)
    comparisons, a non-starter when neither side broadcasts.  The scalable
    form EXPLODES each interval into the time buckets it touches
    (``sequence(floor(start/W), floor(end/W))``) and equi-joins on the
    bucket, so the shuffle is hash-partitioned on time locality and only
    temporally-close rows ever meet; the exact overlap predicate then
    filters within buckets, and one ``dropDuplicates`` removes the
    multi-bucket double-matches.  Cost scales with sum(interval_length)/W
    per side — pick ``bucket_seconds`` near the median interval length so
    the fan-out stays O(1) per row.

    Timestamps may be TIMESTAMP or TIMESTAMP_NTZ; both are cast through
    TIMESTAMP (session TZ pinned UTC) to epoch seconds.
    """
    left_keep = left_keep or left.columns
    right_keep = right_keep or right.columns

    def _ep(c: str) -> Column:
        return F.unix_timestamp(F.col(c).cast("timestamp"))

    lb = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(_ep(left_start) / bucket_seconds),
                F.floor(_ep(left_end) / bucket_seconds),
            )
        ),
    )
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(_ep(right_start) / bucket_seconds),
                F.floor(_ep(right_end) / bucket_seconds),
            )
        ),
    )
    joined = lb.alias("l").join(
        rb.alias("r"),
        (F.col("l._bkt") == F.col("r._bkt"))
        & (F.col(f"l.{left_start}") <= F.col(f"r.{right_end}"))
        & (F.col(f"r.{right_start}") <= F.col(f"l.{left_end}")),
    )
    out = joined.select(
        *[F.col(f"l.{c}") for c in left_keep],
        *[F.col(f"r.{c}") for c in right_keep],
    )
    return out.dropDuplicates(left_keep + right_keep)

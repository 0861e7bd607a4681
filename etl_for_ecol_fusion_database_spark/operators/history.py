"""X7 slowly-changing-dimension (SCD2) history derivation.

The reference's ``CL_STATUS_HISTORY`` table (SURVEY.md §1.1) is an
append-only event log of status transitions; the flagship view answers
"what was the status as of date D" by rank-filtering it.  The general
operator behind that shape is SCD2 interval derivation: turn a change log
into validity intervals ``[valid_from, valid_to)`` with an
``is_current`` flag — the standard warehouse history table an ETL
pipeline maintains.

One shuffle on the entity key; both window functions (change detection +
interval close) share the same ``partitionBy(key) orderBy(ts)``
partitioning, so Catalyst plans a single Sort + Window pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an event log into SCD2 validity intervals.

    Consecutive events with the same ``attr_col`` value are merged
    (change-detection via ``lag``); each surviving change opens an
    interval closed by the next change's timestamp (``lead``), with the
    latest interval left open (``valid_to`` NULL, ``is_current`` 1).

    ``tiebreak`` orders simultaneous events deterministically (e.g. the
    event PK).
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    changes = df.select(
        key, ts_col, attr_col, *([tiebreak] if tiebreak else []),
        F.lag(attr_col).over(w).alias("_prev"),
    ).filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    # lead() over the same (key, ts) partitioning — the change rows are
    # already sorted within each key partition, so no second shuffle
    w2 = Window.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.when(F.lead(ts_col).over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_current"),
    )

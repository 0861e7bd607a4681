"""Robust anomaly detection over the event stream: median / MAD outliers.

The production shape for "find bad values at 100 TB": two exact-percentile
aggregations per group plus a broadcast-join filter.  Group cardinality is
the event-type vocabulary (tiny), so both median tables broadcast; the
events fact table is scanned, never shuffled on a high-cardinality key.

Medians are EXACT (``F.percentile``, linear interpolation — the same
definition DuckDB's ``median``/``quantile_cont`` uses), so the whole
operator is oracle-checkable; at truly extreme group sizes swap
``percentile`` for ``percentile_approx`` and accept the sketch bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: scale factor that makes MAD a consistent estimator of sigma for normal
#: data (1 / Phi^-1(3/4)) — the standard robust-zscore constant
MAD_SIGMA = 1.4826


def mad_outlier_summary(
    df: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier summary.

    outlier  ⇔  |x - median| > n_sigmas * 1.4826 * MAD

    Returns ``(group, med, mad, n_outliers, n_total)``.  Plan: one
    group-median aggregation, broadcast back, one deviation-median
    aggregation, broadcast back, one counting aggregation — three passes
    over a columnar scan with only tiny-key shuffles.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile("_absdev", F.lit(0.5)).alias("_mad")
    )
    scored = dev.join(F.broadcast(mad), group_col)
    thresh = F.lit(n_sigmas) * F.lit(MAD_SIGMA) * F.col("_mad")
    return scored.groupBy(group_col).agg(
        F.round(F.min("_med"), 6).alias("med"),
        F.round(F.min("_mad"), 6).alias("mad"),
        F.sum(F.when(F.col("_absdev") > thresh, 1).otherwise(0)).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_total"),
    )

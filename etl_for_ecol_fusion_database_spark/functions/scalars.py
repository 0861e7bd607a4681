"""Scalar derivations F1-F7 (SURVEY.md §2.8) as composable Column builders.

Each helper cites the reference expression it reproduces; all are built-in
``pyspark.sql.functions`` expressions (JVM-side, whole-stage-codegen
friendly) — the reference needed zero UDFs and so do we (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def literal_date(value: str) -> Column:
    """F1: ``TO_DATE('2026-06-30','YYYY-MM-DD')``
    (create_view_vw_valid_collision_from_oracle.sql:5-25)."""
    return F.to_date(F.lit(value), "yyyy-MM-dd")


def format_date(col: Column | str) -> Column:
    """F2/F7: ``TO_CHAR(ts,'YYYY-MM-DD')`` / pandas ``strftime('%Y-%m-%d')``
    (create_view_vw_valid_collision_from_oracle.sql:32;
    etl_ecollision_fusion_table_collisions.py:93-94)."""
    return F.date_format(col, "yyyy-MM-dd")


def extract_year(col: Column | str) -> Column:
    """F3: ``EXTRACT(YEAR FROM date)``
    (create_view_vw_valid_collision_from_oracle.sql:43,115,132).
    Cast to int pinned for oracle-schema parity."""
    return F.year(col).cast("int")


def to_date_trunc(col: Column | str) -> Column:
    """F4: ``::DATE`` timestamp->date truncation
    (create_view_vw_valid_collision_from_oracle.sql:75-76)."""
    return F.col(col).cast("date") if isinstance(col, str) else col.cast("date")


def coalesce_timestamps(primary: Column | str, fallback: Column | str) -> Column:
    """F5: prefer ``occurence_timestamp`` else ``reported_timestamp``
    (pandas ``fillna`` at etl_ecollision_fusion_table_collisions.py:28)."""
    return F.coalesce(primary if isinstance(primary, Column) else F.col(primary),
                      fallback if isinstance(fallback, Column) else F.col(fallback))


def lenient_year(col: Column | str) -> Column:
    """F6: ``pd.to_datetime(errors='coerce').dt.year``
    (etl_ecollision_fusion_table_collisions.py:29).

    ``to_timestamp`` yields NULL on unparseable input when
    ``spark.sql.ansi.enabled=false`` (pinned in session.PARITY_CONF —
    SURVEY.md §7.3.5), matching pandas' coerce semantics.
    """
    return F.year(F.to_timestamp(col)).cast("int")

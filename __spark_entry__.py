"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``etl_for_ecol_fusion_database_spark``; this module
only adapts that package to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_for_ecol_fusion_database_spark import registry
from etl_for_ecol_fusion_database_spark.session import pin_parity_conf

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.3 valid-collision pipeline) on
    /root/testdata/sf0.001; driver checks rows>0."""
    pin_parity_conf(spark)
    return registry.QUERIES["flagship_valid_cohort"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each ``queries()`` key.
    Keys absent here (non-SQL-expressible ops, e.g. LSH/simhash/streaming)
    get the driver's weaker rows-only check."""
    return dict(registry.ORACLES)

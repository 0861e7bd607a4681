"""SparkSession factory and parity-critical config pinning.

The reference's timestamp semantics are timezone-naive (PostgreSQL
``timestamp without time zone``; type maps at
/root/reference/helper_db_operation.py:178-181,214-217) and its pandas
datetime parsing is lenient (``errors='coerce'`` at
/root/reference/etl_ecollision_fusion_table_collisions.py:29).  Spark 4
defaults to ANSI mode (raise on bad casts) and session-TZ-relative
timestamps, so both knobs are pinned here — see SURVEY.md §7.3 items 1 & 5.

``pin_parity_conf`` only touches runtime-settable SQLConf entries so it is
safe to call on a session we did not create (the driver owns the session in
``__spark_entry__.queries()`` callables).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: runtime-settable conf required for reference/oracle parity
PARITY_CONF: dict[str, str] = {
    # naive-timestamp parity with the DuckDB oracle and the reference's
    # `timestamp without time zone` columns
    "spark.sql.session.timeZone": "UTC",
    # pandas to_datetime(errors='coerce') parity: NULL on unparseable input
    "spark.sql.ansi.enabled": "false",
    # map Arrow interop for any pandas_udf extension operators
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

#: session-level conf for scale posture (AQE re-plans shuffles at runtime,
#: coalesces small partitions and splits skewed ones — SURVEY.md §4)
SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # canonical AQE at-scale posture: START every planner-inserted shuffle
    # wide and let runtime coalescing shrink it by measured bytes, instead
    # of capping every exchange at spark.sql.shuffle.partitions.  Two
    # concrete wins (round-10 sf100 panel): (1) reducer-side parallelism
    # follows data size, so a 100x corpus doesn't funnel through 32
    # reducers; (2) a join against an explicitly repartitioned relation
    # (REPARTITION_BY_NUM) co-partitions at the USER's count — with a
    # fixed-width ENSURE_REQUIREMENTS exchange on the other side, Spark
    # instead rewrote the user exchange down to the conf width, silently
    # restoring the un-spillable SHJ build sizes the repartition existed
    # to bound (minhash verify join: OOM at 5M docs without this).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "2048",
    # without this, AQE may not re-plan a CACHED relation's output stage,
    # so persist() materializes at the full initialPartitionNum width —
    # x9_curation_v2's 2-column cached survivors relation became 2048
    # tiny blocks + 2048-task downstream scans (0.5 -> 3.4 s at sf0.1)
    # until the cache was allowed to coalesce like every other stage
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def pin_parity_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable parity conf to an existing session."""
    for k, v in PARITY_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-runtime-settable on this build: leave session default
            pass
    return spark


def get_spark(
    app_name: str = "etl-for-ecol-fusion-database-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for local[N] testing.

    On a real cluster the same declarative plans run unchanged; only
    ``master`` / partition counts differ (AQE owns shuffle sizing either
    way).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
    )
    for k, v in {**SCALE_CONF, **PARITY_CONF}.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus))
    )
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.ui.showConsoleProgress", "false")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return pin_parity_conf(spark)

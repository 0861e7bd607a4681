"""Structured Streaming surface over the events table (SURVEY.md §2.9 [ext]).

The reference is batch-only; its one stream-shaped entity is the append-only
CL_STATUS_HISTORY log consumed with point-in-time cutoffs
(create_view_vw_valid_collision_from_oracle.sql:59-77).  This module runs the
same event-log computations as continuous queries:

- tumbling / sliding / session event-time windows with watermarks,
- stateful streaming dedup (``dropDuplicatesWithinWatermark``),
- a streaming flavor of the latest-status-at-cutoff operator.

Batch/stream parity: every aggregation here reuses the exact expression
shapes of the batch queries (registry_ext x5_*), so a file-source replay
with ``trigger(availableNow=True)`` must produce the batch answer — that's
the invariant tests/test_streaming.py asserts.

Scale posture: state is keyed per (window, event_type) or per user —
bounded domains; the watermark bounds state retention; file sources at
100 TB become Kafka sources with identical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

#: explicit schema for the file stream source (streams cannot infer); the
#: fixture stores ``ts`` as parquet TIMESTAMP(MICROS) without timezone,
#: which Spark surfaces as TIMESTAMP_NTZ — matching the batch loader
#: (catalog.load_table) so stream/batch twins share expression shapes.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture parquet (at production
    scale this is a Kafka/queue source; the downstream plan is identical)."""
    # the file source requires a *directory*; select just the events file
    # from the fixture dir with a glob filter
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    # watermarks require TIMESTAMP (LTZ); session TZ is pinned UTC so the
    # NTZ->LTZ cast is wall-clock-identical to the batch loader's column
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark —
    streaming twin of registry_ext.x5_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, *, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding event-time windows (each event lands in window/slide panes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(events: DataFrame, *, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user — streaming twin of x5_session_windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on the natural key (user_id, event_type, ts)
    — state bounded by the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "ts"]
    )


def latest_status_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming flavor of the A4/W1 latest-status operator: max_by over the
    (ts, event_type) ordering struct per user, emitted per window close.

    A truly unbounded 'latest ever' needs complete-mode or
    applyInPandasWithState; windowed latest keeps state bounded and is the
    shape production pipelines use."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.max_by(F.struct("event_type", "ts"), F.struct("ts", "event_type")).alias("m"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            F.col("m.event_type").alias("latest_status"),
        )
    )


#: output / state schemas for the custom stateful operator
RUNNING_LATEST_OUT = (
    "user_id LONG, latest_ts TIMESTAMP, latest_status STRING, n_events LONG"
)
RUNNING_LATEST_STATE = "latest_ts TIMESTAMP, latest_status STRING, n_events LONG"


def _running_latest_fn(key, pdfs, state):
    """Per-user stateful reducer: fold each micro-batch's rows into
    (latest_ts, latest_status, n_events) state, ordering by (ts, event_type)
    exactly like the batch ``max_by(struct(event_type, ts),
    struct(ts, event_type))`` in a4_argmax_latest_event."""
    import pandas as pd

    (user_id,) = key
    if state.exists:
        latest_ts, latest_status, n_events = state.get
    else:
        latest_ts, latest_status, n_events = None, None, 0
    for pdf in pdfs:
        # Arrow chunking can deliver empty frames (see RunningValueStats /
        # tests' explicit empty-frame batch) — iloc[-1] on one would raise
        if len(pdf) == 0:
            continue
        n_events += len(pdf)
        # rows with null ts/event_type are malformed for the latest fold:
        # pandas sorts NaT LAST, so one would mask the chunk's real events
        # (and a None event_type makes the tie tuple-compare raise); they
        # still count toward n_events, like the batch twin's count(*)
        valid = pdf.dropna(subset=["ts", "event_type"])
        if len(valid) == 0:
            continue
        top = valid.sort_values(["ts", "event_type"]).iloc[-1]
        ts = top["ts"].to_pydatetime() if hasattr(top["ts"], "to_pydatetime") else top["ts"]
        if latest_ts is None or (ts, top["event_type"]) > (latest_ts, latest_status):
            latest_ts, latest_status = ts, top["event_type"]
    state.update((latest_ts, latest_status, n_events))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "latest_ts": latest_ts,
                "latest_status": latest_status,
                "n_events": n_events,
            }
        ]
    )


def running_latest_status(events: DataFrame) -> DataFrame:
    """TRULY unbounded latest-status-per-user as a custom stateful operator
    via ``applyInPandasWithState`` — the operator the windowed
    ``latest_status_stream`` docstring defers to.  State is one small tuple
    per user (bounded by the user-id domain, not by time), updated from
    Arrow-batched pandas frames; each micro-batch emits the refreshed row
    for every user it touched (update mode).

    Scale posture: state is keyed per user and O(1) per key; the shuffle is
    the same hash-partition-by-key every streaming agg pays.  No watermark is
    needed because 'latest ever' never closes — late events fold in
    correctly since the reducer compares (ts, event_type) rather than
    assuming arrival order."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _running_latest_fn,
        outputStructType=RUNNING_LATEST_OUT,
        stateStructType=RUNNING_LATEST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(df: DataFrame, name: str, *, output_mode: str = "append"):
    """Execute a streaming plan to completion over the file source
    (availableNow) into an in-memory sink; returns the query handle."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def write_stream_parquet(df: DataFrame, path: str, checkpoint: str, *, output_mode: str = "append"):
    """Production-shaped sink: parquet files + checkpoint dir (exactly-once
    via the streaming commit log)."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream_with_dimension(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich each event with a (batch) dimension row.

    The static side is broadcast per micro-batch — a stream-static equi-join
    never requires stream-side state (no watermark needed), which is why it
    is THE pattern for decode/dimension joins on a 100 TB event firehose;
    the dimension is re-resolved each batch, so slowly-changing dims are
    picked up without restarting the query."""
    return events.join(F.broadcast(dim), on=on, how="left")


def foreach_batch_dedup_sink(df: DataFrame, path: str, checkpoint: str, key_cols: list[str]):
    """Idempotent ``foreachBatch`` parquet sink: each micro-batch is
    deduplicated on ``key_cols`` (min-first survivorship within the batch)
    and appended; the checkpoint's batch-id tracking makes replays after
    failure write-once per batch (foreachBatch delivers each batch id at
    least once; the sink dir keyed by batch id makes re-processing
    overwrite-idempotent rather than double-append).

    This is the escape hatch for sinks without native exactly-once streaming
    support (JDBC upserts, MERGE targets): the same callback can issue a
    keyed MERGE instead of a parquet write."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic min-first survivorship: dropDuplicates keeps an
        # ARBITRARY row per key (a failure-replay of the same batch id
        # could then persist a different survivor than the original run,
        # breaking the idempotence story) — rank by the non-key columns
        # ascending instead and keep row 1
        others = [c for c in batch_df.columns if c not in key_cols]
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.asc_nulls_first(c) for c in (others or key_cols)]
        )
        (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .write.mode("overwrite")
            .parquet(f"{path}/batch_id={batch_id}")
        )

    return (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def view_click_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each click to the prior views
    by the same user within ``max_gap`` (classic attribution / funnel
    stitching).

    Both inputs are event streams; Spark buffers each side in state keyed by
    user_id and the watermarks + the two-sided time-range predicate bound
    how long rows are retained — without BOTH bounds the state grows
    forever, which is the canonical stream-stream join failure mode at
    100 TB.  Inner-join matches emit as soon as both rows arrive (append
    mode).  The same function applied to two batch DataFrames yields the
    batch twin (registry_ext.x5_view_click_attribution shares this shape)."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    joined = v.join(
        c,
        F.expr(
            f"""view_user = click_user
                AND click_ts >= view_ts
                AND click_ts <= view_ts + INTERVAL {max_gap}"""
        ),
    )
    return joined.select(
        "view_id",
        "click_id",
        F.col("view_user").alias("user_id"),
        (
            F.unix_micros(F.col("click_ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


RUNNING_VALUE_OUT = "user_id LONG, n_events LONG, total_value DOUBLE, max_value DOUBLE"


def running_value_stats(events: DataFrame) -> DataFrame:
    """Per-user running value statistics via ``transformWithStateInPandas``
    — the Spark-4 arbitrary-state API (StatefulProcessor + typed state
    handles), the successor to ``applyInPandasWithState``: state is a
    named, schema'd ValueState the runtime owns (checkpointed, TTL-able,
    queryable via the state data source), not an opaque tuple.

    Semantics: unbounded per-user (count, sum, max) over ``value``,
    re-emitted for every user a micro-batch touches (update mode).  The
    reducer is a commutative monoid fold, so multi-batch replay converges
    to the batch aggregate regardless of file/batch boundaries — asserted
    in tests/test_streaming.py.  Scale posture: O(1) state per key, one
    hash shuffle on the key — identical to the applyInPandasWithState
    operator it modernizes (running_latest_status).

    Runtime note: the transformWithState driver worker requires
    ``google.protobuf`` (its state-server protocol), which this container
    cannot install (no network, no bundled wheel — re-confirmed round 6);
    the end-to-end parity test skips there and applyInPandasWithState
    remains the in-container-exercised runtime path.  The processor's
    REDUCER logic is module-level (``make_running_value_stats_processor``)
    so tests drive init/handleInputRows against a fake state handle and
    the multi-batch fold == batch-aggregate invariant is exercised even
    where the wire protocol cannot run."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_value_stats_processor(),
        outputStructType=RUNNING_VALUE_OUT,
        outputMode="Update",
        timeMode="None",
    )


def make_running_value_stats_processor():
    """Build the ``RunningValueStats`` StatefulProcessor (see
    :func:`running_value_stats`).  Factory-shaped so the class definition
    (which subclasses the Spark-4 StatefulProcessor ABC) imports lazily,
    and so tests can instantiate the processor and drive
    ``init``/``handleInputRows`` directly with a stub
    StatefulProcessorHandle/ValueState — covering the reducer semantics
    without the protobuf state-server runtime."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningValueStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n LONG, total DOUBLE, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = 0, 0.0, None
            if self._stats.exists():
                n, total, mx = self._stats.get()
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                # fold over non-null values only: pandas' all-NaN max is
                # NaN, and max(NaN, m) sticks at NaN forever (Python max
                # returns its first arg on False comparisons) — while the
                # batch F.sum/F.max ignore nulls; n stays count(*)
                vals = pdf["value"].dropna()
                if len(vals) == 0:
                    continue
                total += float(vals.sum())
                m = float(vals.max())
                mx = m if mx is None else max(mx, m)
            self._stats.update((n, total, mx))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "total_value": total,
                        "max_value": mx,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return RunningValueStats()

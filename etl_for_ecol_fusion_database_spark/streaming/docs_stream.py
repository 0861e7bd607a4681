"""Structured-Streaming document curation: the training-data pipeline's
ingest path run incrementally over files as they land.

Batch and streaming share ONE plan: every stage below (quality scoring,
language gate, fingerprint dedup) is the same narrow-or-aggregate
DataFrame composition the batch registry queries use, applied to a
``readStream`` file source.  At production scale the source is a
queue/object-store listing and the sink a partitioned table; the
dataflow in between is identical — that single-plan property is the
point of building on Spark.

State note: streaming ``dropDuplicates`` on the content fingerprint
keeps one fingerprint per key in the state store FOREVER (documents
carry no event time, so there is no watermark to expire on).  That is
the correct semantic for corpus dedup — a duplicate arriving a month
late is still a duplicate — and the state is one 16-byte md5 + overhead
per *unique* document, orders of magnitude smaller than the corpus.
For bounded-state variants over timestamped streams, see
``events_stream.dedup_within_watermark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import text

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream: picks up parquet files as they appear under
    ``path`` (one file per micro-batch by default, mimicking arrival)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def curate_documents(
    docs: DataFrame, *, min_quality: float = 0.3, langs: tuple[str, ...] = ("en",)
) -> DataFrame:
    """The curation core, batch/stream agnostic: quality gate -> language
    gate -> exact-fingerprint dedup.  Returns
    ``(doc_id, lang, quality_score, fingerprint)`` for accepted docs."""
    gated = (
        docs.withColumn("quality_score", text.quality_score_expr("text"))
        .filter(F.col("quality_score") >= F.lit(min_quality))
        .filter(F.col("lang").isin(*langs))
    )
    fp = gated.withColumn(
        "fingerprint", F.md5(text.normalize_text(F.col("text")))
    )
    return fp.select("doc_id", "lang", "quality_score", "fingerprint").dropDuplicates(
        ["fingerprint"]
    )


def run_curation_to_parquet(
    docs_stream: DataFrame, dest: str, checkpoint: str
):
    """Checkpointed incremental curation into a parquet corpus dir.
    ``availableNow`` drains everything currently on disk then stops —
    the replayable-backfill trigger; a live deployment uses the default
    continuous micro-batch trigger with the same call."""
    return (
        curate_documents(docs_stream)
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

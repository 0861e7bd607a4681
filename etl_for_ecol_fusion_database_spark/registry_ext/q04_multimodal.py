"""X4 JSON / multimodal columns — split from the single-module registry_ext (round 6).

Registration order is load-bearing (the __spark_entry__ witness rotation
samples in registration order): registry_ext/__init__.py imports the
block modules in the original file's order and entries within each module
keep their original sequence — append, don't reorder.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ..catalog import load_table  # noqa: F401
from ..operators import dedup, multimodal, sampling, similarity, text  # noqa: F401
from ..registry import query  # noqa: F401
from ._shared import (  # noqa: F401
    _LANG_CASE,
    _LANG_GREATEST,
    _LANG_SCORE_SQL,
    _RT_DIRS,
    _SCD2_FULL_RECOMPUTE_ORACLE,
    _STOP_LIST,
    _marker_list,
    _rt_tmpdir,
    _t,
    _with_synthetic_near_dups,
)

# ===========================================================================
# X4 — JSON / multimodal columns
# ===========================================================================


@query(
    "x4_json_props",
    oracle="""
SELECT event_id, user_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value
FROM events
""",
)
def x4_json_props(spark, sf_dir):
    """X4 JSON property extraction from events.props."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query(
    "x4_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
""",
)
def x4_binary_meta(spark, sf_dir):
    """X4 opaque-binary column plumbing: utf-8 byte length off the BINARY
    column + content digest (metadata travels beside the blob)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(F.encode("text", "utf-8")).cast("int").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


@query(
    "x4_media_decode",
    oracle=r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       array_to_string(
         [CAST(coalesce(list_sum([ascii(text[i])
                                  for i in generate_series(d + 1, length(text), 8)]), 0)
               % 1000 AS VARCHAR)
          for d in generate_series(0, 7)], ',') AS feature_sig
FROM documents
""",
)
def x4_media_decode(spark, sf_dir):
    """X4 multimodal decode plumbing: documents -> opaque media BLOBs ->
    Arrow-batched (fake) decoder via mapInPandas; real codec is a marked
    stub (operators/multimodal.py).  The fake feature is pure integer byte
    arithmetic (strided sums mod 1000), so the DuckDB oracle replicates it
    exactly with a nested list comprehension over ascii codes — a FULL
    value-hash check of the mapInPandas plumbing, not just a row count.
    The driver column is the integer signature (recovered losslessly from
    the float feature: each value is k/1000); downstream consumers use
    decode_media directly and get the typed array<float>."""
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    decoded = multimodal.decode_media(media)
    return decoded.select(
        "doc_id",
        "n_bytes",
        F.expr(
            "concat_ws(',', transform(feature,"
            " x -> CAST(CAST(round(x * 1000) AS INT) AS STRING)))"
        ).alias("feature_sig"),
    )


@query(
    "x4_media_decode_meta",
    oracle="""
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
)
def x4_media_decode_meta(spark, sf_dir):
    """X4 decode metadata path with a full oracle: the mapInPandas decoder's
    doc_id/n_bytes output checked exactly against DuckDB's byte lengths —
    proves the Arrow batch plumbing preserves row identity and sizes."""
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.decode_media(media).select("doc_id", "n_bytes")


@query(
    "x4_media_meta_summary",
    oracle="""
SELECT 'image' AS media_type, COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
""",
)
def x4_media_meta_summary(spark, sf_dir):
    """X4 metadata-only aggregation over the media table — the BLOB column
    is pruned from the scan (struct-field pushdown)."""
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.media_metadata_summary(media)



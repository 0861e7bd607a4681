"""X3 (cont.) repetition quality signals + PII scrubbing — split from the single-module registry_ext (round 6).

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
# X3 (cont.) — repetition quality signals + PII scrubbing
# ===========================================================================


@query(
    "x3_repetition_signals",
    oracle=r"""
WITH base AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents
),
ucnt AS (
    SELECT doc_id, gram, COUNT(*) AS c
    FROM base, UNNEST(t) AS u(gram)
    GROUP BY doc_id, gram
),
u AS (
    SELECT doc_id, SUM(c) AS u_n, COUNT(*) AS u_distinct, MAX(c) AS u_top
    FROM ucnt GROUP BY doc_id
),
bcnt AS (
    SELECT doc_id, gram, COUNT(*) AS c
    FROM (
        SELECT doc_id,
               UNNEST(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS gram
        FROM base WHERE len(t) >= 2
    )
    GROUP BY doc_id, gram
),
b AS (
    SELECT doc_id, SUM(c) AS b_n, MAX(c) AS b_top FROM bcnt GROUP BY doc_id
)
SELECT u.doc_id,
       CAST(u.u_n AS INT) AS n_tokens,
       ROUND(1.0 - u.u_distinct / u.u_n, 6) AS dup_token_fraction,
       ROUND(u.u_top / u.u_n, 6) AS top_token_fraction,
       ROUND(COALESCE(b.b_top / b.b_n, 0.0), 6) AS top_bigram_fraction
FROM u LEFT JOIN b ON u.doc_id = b.doc_id
""",
)
def x3_repetition_signals(spark, sf_dir):
    """X3 Gopher-style repetition signals: dup-token / top-token /
    top-bigram fractions per document (explode + two doc_id-keyed hash
    aggregations — the long-document-safe shape; see
    operators/text.py:repetition_signals)."""
    return text.repetition_signals(_t(spark, sf_dir, "documents"))


@query(
    "x3_pii_redaction",
    oracle=r"""
WITH injected AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 today' ELSE '' END
           AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS INT) AS n_phones,
       regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g') AS redacted
FROM injected
""",
)
def x3_pii_redaction(spark, sf_dir):
    """X3 PII scrubbing: email/phone detection counts + typed-placeholder
    redaction (narrow regexp projection, identical Java/RE2 pattern on both
    engines).  Synthetic PII is injected deterministically because the
    fixture corpus contains none."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567 today")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return text.pii_redact(docs)



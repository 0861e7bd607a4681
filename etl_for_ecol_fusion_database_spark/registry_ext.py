"""Extension-operator registry (SURVEY.md §2.11 / north-star X1-X5):
dedup, similarity search, text analysis, multimodal columns, event windows.

Same conventions as registry.py.  Queries without an oracle entry
(xxhash64-based LSH/SimHash, mapInPandas decode) get the driver's rows-only
check; every one of those still has a property-based pytest
(tests/test_ext_operators.py) asserting semantic invariants against an
exact ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .operators import dedup, multimodal, sampling, similarity, text
from .registry import query


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ===========================================================================
# X1 — deduplication
# ===========================================================================


@query(
    "x1_dedup_exact_docs",
    oracle="""
SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
)
def x1_dedup_exact_docs(spark, sf_dir):
    """X1 exact dedup on documents.text: hash-groupBy with deterministic
    min-id survivorship (map-side combine collapses dup groups pre-shuffle)."""
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"), ["text"], "doc_id")


@query(
    "x1_dedup_exact_events",
    oracle="""
SELECT user_id, event_type, MIN(event_id) AS keep_id, COUNT(*) AS n_copies
FROM events GROUP BY user_id, event_type
""",
)
def x1_dedup_exact_events(spark, sf_dir):
    """X1 exact dedup on a composite key (user_id, event_type)."""
    return dedup.exact_dedup_groups(
        _t(spark, sf_dir, "events"), ["user_id", "event_type"], "event_id"
    )


@query(
    "x1_ngram_jaccard_pairs",
    oracle=r"""
WITH sh AS (
    SELECT doc_id AS id,
           CASE WHEN len(toks) >= 2
                THEN list_distinct([toks[i] || ' ' || toks[i+1]
                                    for i in generate_series(1, len(toks) - 1)])
                ELSE list_distinct(toks) END AS sh
    FROM (
        SELECT doc_id,
               regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS toks
        FROM documents WHERE doc_id < 200
    ) t
)
SELECT a.id AS id_a, b.id AS id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE, 6) AS jaccard
FROM sh a JOIN sh b ON a.id < b.id
WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE, 6) >= 0.05
""",
)
def x1_ngram_jaccard_pairs(spark, sf_dir):
    """X1 n-gram Jaccard near-dup scoring (exact all-pairs over a bounded id
    range — the ground truth the MinHash path approximates)."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=2, threshold=0.05, max_id=200
    )


def _with_synthetic_near_dups(docs):
    """Append mutated copies of the first 20 docs (drop first word,
    id+1_000_000) — guarantees true near-duplicates exist at any scale
    factor so LSH recall checks are non-vacuous."""
    mutated = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"^\S+\s+", "").alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(mutated)


@query("x1_minhash_near_dup")  # xxhash64-based -> rows-only driver check
def x1_minhash_near_dup(spark, sf_dir):
    """X1 MinHash+LSH near-dup pairs (shingle -> 32-hash signature -> 8-band
    bucketing -> candidate join -> exact-Jaccard verify).  Synthetic mutated
    copies are injected so true near-dups exist; recall vs the exact
    ngram-Jaccard ground truth is asserted in tests/test_ext_operators.py."""
    docs = _with_synthetic_near_dups(_t(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_pairs(
        docs, n=2, num_hashes=32, n_bands=8, threshold=0.4
    )


def _minhash_portable_oracle() -> str:
    """DuckDB replay of the ENTIRE portable MinHash+LSH pipeline — built
    from the same constants as operators/dedup.minhash_lsh_pairs_portable
    so the two cannot drift."""
    mins = ",\n           ".join(
        f"MIN(({dedup._PORT_A[i]} * x + {dedup._PORT_B[i]}) % {dedup._P_PORT}) AS m_{i}"
        for i in range(16)
    )
    bands = "\n             ".join(
        "WHEN {b} THEN array_to_string([{slots}], ',')".format(
            b=b, slots=", ".join(f"m_{b * 4 + j}" for j in range(4))
        )
        for b in range(4)
    )
    return rf"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, regexp_replace(text, '^\S+\s+', '')
    FROM documents WHERE doc_id < 20
),
toks AS (
    SELECT doc_id AS id,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS t
    FROM docs
),
sh AS (
    SELECT id,
           unnest(CASE WHEN len(t) >= 2
                       THEN list_distinct([t[i] || ' ' || t[i+1]
                                           for i in generate_series(1, len(t) - 1)])
                       ELSE list_distinct(t) END) AS shingle
    FROM toks
),
h AS (
    SELECT id, shingle,
           CAST(list_sum([(strpos('0123456789abcdef', md5(shingle)[i]) - 1)
                          * CAST(power(16, 12 - i) AS BIGINT)
                          for i in generate_series(1, 12)])
                % {dedup._P_PORT} AS BIGINT) AS x
    FROM sh
),
sig AS (
    SELECT id, COUNT(*) AS sz,
           {mins}
    FROM h GROUP BY id
),
banded AS (
    SELECT id, sz, band_idx,
           CASE band_idx
             {bands}
           END AS band_key
    FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band_idx)
),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
),
inter AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
    FROM cand c
    JOIN sh s1 ON s1.id = c.id_a
    JOIN sh s2 ON s2.id = c.id_b AND s2.shingle = s1.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b,
       round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
             / (c.sz_a + c.sz_b - coalesce(i.n_inter, 0)), 6) AS jaccard
FROM cand c LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
WHERE round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
            / (c.sz_a + c.sz_b - coalesce(i.n_inter, 0)), 6) >= 0.4
"""


@query("x1_minhash_portable", oracle=_minhash_portable_oracle())
def x1_minhash_portable(spark, sf_dir):
    """X1 MinHash+LSH with the PORTABLE hash family
    (operators/dedup.minhash_lsh_pairs_portable): md5-prefix base hash +
    mod-p universal permutations, so the DuckDB oracle replays the entire
    pipeline — signatures, band collisions, candidate join, exact-Jaccard
    verification — and the driver value-hash checks it end-to-end.  This is
    the oracle-verified witness for the MinHash pipeline SHAPE; the
    xxhash64 fast path (x1_minhash_near_dup) keeps the production hash and
    a rows-only check."""
    docs = _with_synthetic_near_dups(_t(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_pairs_portable(
        docs, n=2, num_hashes=16, n_bands=4, threshold=0.4
    )


@query("x1_simhash_near_pairs")  # xxhash64-based -> rows-only driver check
def x1_simhash_near_pairs(spark, sf_dir):
    """X1 SimHash near-dup pairs at hamming<=6 via 4-block pigeonhole
    equality joins (finds hamming<=3 exhaustively; 4-6 opportunistically)."""
    docs = _with_synthetic_near_dups(_t(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs(docs, max_hamming=6)


def _simhash_portable_oracle() -> str:
    """DuckDB replay of the portable SimHash pipeline — generated from the
    same n_bits/blocks as operators/dedup.simhash_near_pairs_portable."""
    votes = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(32)
    )
    packing = " + ".join(
        f"CASE WHEN v_{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32)
    )
    return rf"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, regexp_replace(text, '^\S+\s+', '')
    FROM documents WHERE doc_id < 20
),
tok AS (
    SELECT doc_id AS id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS t
    FROM docs
),
h AS (
    SELECT id,
           CAST(list_sum([(strpos('0123456789abcdef', md5(t)[j]) - 1)
                          * CAST(power(16, 12 - j) AS BIGINT)
                          for j in generate_series(1, 12)]) AS BIGINT) AS h
    FROM tok
),
v AS (
    SELECT id,
           {votes}
    FROM h GROUP BY id
),
fp AS (
    SELECT id, CAST({packing} AS BIGINT) AS simhash FROM v
),
blocks AS (
    SELECT id, simhash, b AS block_idx, (simhash >> (8 * b)) & 255 AS block_val
    FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM blocks a JOIN blocks b
  ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@query("x1_simhash_portable", oracle=_simhash_portable_oracle())
def x1_simhash_portable(spark, sf_dir):
    """X1 SimHash with the PORTABLE md5-prefix hash family
    (operators/dedup.simhash_near_pairs_portable): 32-bit fingerprint,
    8-bit pigeonhole blocks, hamming<=3 — the DuckDB oracle replays votes,
    packing, block join, and popcount verification exactly, so the SimHash
    pipeline gets a full value-hash driver check beside the 63-bit
    xxhash64 fast path's rows-only entry."""
    docs = _with_synthetic_near_dups(_t(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs_portable(docs, max_hamming=3)


@query(
    "x1_embedding_near_dup",
    oracle="""
WITH base AS (
    SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS norm
    FROM embeddings WHERE vec_id < 200
)
SELECT id_a, id_b, cosine FROM (
    SELECT a.id AS id_a, b.id AS id_b,
           round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
    FROM base a JOIN base b ON a.id < b.id
) t WHERE cosine >= 0.3
""",
)
def x1_embedding_near_dup(spark, sf_dir):
    """X1 embedding-cosine near-dup pairs (exact, bounded id range)."""
    return dedup.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, max_id=200
    )


# ===========================================================================
# X2 — similarity search
# ===========================================================================


@query(
    "x2_cosine_topk",
    oracle="""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS norm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           round(list_dot_product(q.v, c.v) / (q.norm * c.norm), 6) AS cosine
    FROM base q JOIN base c ON q.vec_id != c.vec_id
    WHERE q.vec_id < 20
),
ranked AS (
    SELECT q_id, cand_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
    FROM scored
)
SELECT q_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
""",
)
def x2_cosine_topk(spark, sf_dir):
    """X2 brute-force cosine top-k (exact ANN baseline): 20 broadcast query
    vectors against the full corpus, JVM-side double fold for the dot
    product, per-query top-5 on (cosine DESC, cand_id)."""
    return similarity.brute_force_topk(
        _t(spark, sf_dir, "embeddings"), k=5, n_queries=20
    )


@query("x2_lsh_bucketed_ann")  # xxhash64-derived planes -> rows-only check
def x2_lsh_bucketed_ann(spark, sf_dir):
    """X2 LSH-bucketed ANN: 8-bit random-hyperplane signatures bucket the
    corpus; queries probe their bucket + all 1-2-bit flips and rank by exact
    cosine within candidates.  Recall vs x2_cosine_topk asserted in tests."""
    return similarity.lsh_bucketed_ann(
        _t(spark, sf_dir, "embeddings"), k=5, n_queries=20, n_bits=8
    )


@query("x2_ivf_ann")  # deterministic but assignment-argmax heavy -> rows-only
def x2_ivf_ann(spark, sf_dir):
    """X2 IVF-bucketed ANN: Voronoi cells around 16 deterministic centroids,
    4-probe search, exact cosine ranking within the probed cells.  Recall vs
    x2_cosine_topk asserted in tests/test_ext_operators.py."""
    return similarity.ivf_bucketed_ann(
        _t(spark, sf_dir, "embeddings"), k=5, n_queries=20, n_centroids=16, n_probe=4
    )


_COSINE_TOPK_ORACLE = """
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS norm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           round(list_dot_product(q.v, c.v) / (q.norm * c.norm), 6) AS cosine
    FROM base q JOIN base c ON q.vec_id != c.vec_id
    WHERE q.vec_id < 20
),
ranked AS (
    SELECT q_id, cand_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
    FROM scored
)
SELECT q_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
"""


@query("x2_ivf_full_probe", oracle=_COSINE_TOPK_ORACLE)
def x2_ivf_full_probe(spark, sf_dir):
    """X2 IVF ANN in full-probe configuration (n_probe == n_centroids):
    provably identical to brute-force top-k (every cell is probed, so the
    candidate set is the whole corpus) — checked against the exact
    brute-force oracle, which also validates the IVF plumbing (cell
    assignment + probe join + in-cell ranking) end to end.  The 4-probe
    flavor above is the scale configuration (rows-only + recall tests)."""
    return similarity.ivf_bucketed_ann(
        _t(spark, sf_dir, "embeddings"), k=5, n_queries=20, n_centroids=16, n_probe=16
    )


@query(
    "x2_embedding_norms",
    oracle="""
SELECT vec_id,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings
""",
)
def x2_embedding_norms(spark, sf_dir):
    """X2 embedding hygiene: per-vector L2 norm + dimensionality — the
    normalization/validation pass an ANN index build runs first (catches
    zero vectors and ragged dims before they poison cosine scores)."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(F.sqrt(similarity.norm_sq_expr("embedding")), 6).alias("l2_norm"),
        F.size("embedding").cast("int").alias("dim"),
    )


# ===========================================================================
# X3 — text analysis
# ===========================================================================


@query(
    "x3_token_counts",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
FROM documents
""",
)
def x3_token_counts(spark, sf_dir):
    """X3 token counting: whitespace + BPE-ish pre-tokenizer regex."""
    return text.token_counts(_t(spark, sf_dir, "documents"))


_STOP_LIST = "['" + "','".join(text.STOPWORDS) + "']"


@query(
    "x3_text_quality",
    oracle=rf"""
WITH t AS (
    SELECT doc_id, text,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           length(text) AS n_chars
    FROM documents
),
r AS (
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           len(list_filter(toks, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
               / len(toks)::DOUBLE AS sr,
           n_punct::DOUBLE / n_chars::DOUBLE AS pr,
           least(n_chars::DOUBLE / 500.0, 1.0) AS ln
    FROM t
)
SELECT doc_id, n_tokens,
       round(sr, 6) AS stopword_ratio,
       round(pr, 6) AS punct_ratio,
       round(0.4 * sr + 0.3 * (1.0 - pr) + 0.3 * ln, 6) AS quality_score
FROM r
""",
)
def x3_text_quality(spark, sf_dir):
    """X3 quality scoring: stopword/punctuation/length ratios composed into
    a [0,1] score — the C4/Gopher-style cheap quality filter shape."""
    return text.quality_score(_t(spark, sf_dir, "documents"))


def _marker_list(lang: str) -> str:
    return "['" + "','".join(text.LANG_MARKERS[lang]) + "']"


_LANG_SCORE_SQL = ",\n           ".join(
    f"len(list_filter(toks, x -> list_contains({_marker_list(lang)}, x))) AS s_{lang}"
    for lang in text.LANG_MARKERS
)
_LANG_GREATEST = "greatest(" + ", ".join(f"s_{l}" for l in text.LANG_MARKERS) + ")"
_LANG_CASE = (
    f"CASE WHEN {_LANG_GREATEST} = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = {_LANG_GREATEST} THEN '{lang}'" for lang in text.LANG_MARKERS
    )
    + " END"
)


@query(
    "x3_lang_id",
    oracle=rf"""
WITH t AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS toks
    FROM documents
),
s AS (
    SELECT doc_id,
           {_LANG_SCORE_SQL}
    FROM t
)
SELECT doc_id,
       {", ".join(f"CAST(s_{l} AS INT) AS score_{l}" for l in text.LANG_MARKERS)},
       {_LANG_CASE} AS pred_lang
FROM s
""",
)
def x3_lang_id(spark, sf_dir):
    """X3 language-ID heuristic: marker-vocabulary hit argmax with fixed
    tie order, 'und' when no hits."""
    return text.lang_id(_t(spark, sf_dir, "documents"))


@query(
    "x3_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
""",
)
def x3_fingerprint(spark, sf_dir):
    """X3 document fingerprint: md5 over normalized text (NB DuckDB
    regexp_replace needs the 'g' flag to match Spark's replace-all)."""
    return text.fingerprint_md5(_t(spark, sf_dir, "documents"))


@query("x3_fingerprint_rolling")  # xxhash64 -> rows-only driver check
def x3_fingerprint_rolling(spark, sf_dir):
    """X3 winnowing-style rolling-hash fingerprint (min xxhash64 over
    char 8-grams); invariance under whitespace-only edits tested in
    tests/test_ext_operators.py."""
    return text.fingerprint_rolling(_t(spark, sf_dir, "documents"))


@query(
    "x3_fingerprint_portable",
    oracle=r"""
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents
)
SELECT doc_id,
       list_min([CAST(list_sum([(strpos('0123456789abcdef',
                                        md5(substr(norm, i, 8))[j]) - 1)
                                * CAST(power(16, 12 - j) AS BIGINT)
                                for j in generate_series(1, 12)])
                      % 2147483647 AS BIGINT)
                 for i in generate_series(1, greatest(length(norm) - 7, 1))])
           AS rolling_fp,
       md5(norm) AS exact_fp
FROM n
""",
)
def x3_fingerprint_portable(spark, sf_dir):
    """X3 rolling fingerprint with the portable md5-prefix hash family
    (operators/text.fingerprint_rolling_portable): the DuckDB oracle
    replays the min-over-8-grams winnowing exactly, giving the rolling
    fingerprint a full value-hash driver check; x3_fingerprint_rolling
    keeps the xxhash64 fast path with a rows-only check."""
    return text.fingerprint_rolling_portable(_t(spark, sf_dir, "documents"))


@query(
    "x3_vocab_topk",
    oracle=r"""
SELECT token, n_occurrences FROM (
    SELECT token, COUNT(*) AS n_occurrences
    FROM (
        SELECT unnest(regexp_split_to_array(
            trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
        FROM documents
    ) t
    WHERE token != ''
    GROUP BY token
) g
ORDER BY n_occurrences DESC, token ASC
LIMIT 100
""",
)
def x3_vocab_topk(spark, sf_dir):
    """X3 vocabulary building: top-100 tokens by corpus frequency over
    normalized text (explode -> count with map-side combine -> top-k)."""
    return text.vocab_topk(_t(spark, sf_dir, "documents"), k=100)


@query(
    "x3_length_histogram",
    oracle="""
SELECT CAST(length(text) // 100 AS BIGINT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(length(text)) AS INT) AS min_chars,
       CAST(MAX(length(text)) AS INT) AS max_chars
FROM documents
GROUP BY 1
""",
)
def x3_length_histogram(spark, sf_dir):
    """X3 document-length histogram (100-char buckets) — the before/after
    distribution profile of a curation pipeline."""
    return text.length_histogram(_t(spark, sf_dir, "documents"), bucket_width=100)


@query(
    "x1_training_data_prep",
    oracle=rf"""
WITH t AS (
    SELECT doc_id, text,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           regexp_split_to_array(trim(lower(text)), '\s+') AS ltoks,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           length(text) AS n_chars
    FROM documents
),
scored AS (
    SELECT doc_id, norm,
           CAST(len(toks) AS INT) AS n_tokens,
           round(0.4 * (len(list_filter(toks, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
                        / len(toks)::DOUBLE)
                 + 0.3 * (1.0 - n_punct::DOUBLE / n_chars::DOUBLE)
                 + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0), 6) AS quality_score,
           {_LANG_SCORE_SQL.replace("toks", "ltoks")}
    FROM t
),
filtered AS (
    SELECT * FROM scored
    WHERE quality_score >= 0.5
      AND {_LANG_CASE} = 'en'
)
SELECT MIN(doc_id) AS doc_id,
       arg_min(n_tokens, doc_id) AS n_tokens,
       arg_min(quality_score, doc_id) AS quality_score,
       COUNT(*) AS n_copies
FROM filtered
GROUP BY norm
""",
)
def x1_training_data_prep(spark, sf_dir):
    """X1+X3 composed training-data prep: quality filter + language filter +
    exact dedup (min-id survivorship) in one narrow projection + one
    shuffle — the end-to-end curation pipeline over documents."""
    return text.training_data_prep(
        _t(spark, sf_dir, "documents"), min_quality=0.5, lang="en"
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


# ===========================================================================
# X5 — event-time windows (batch equivalents of the streaming surface;
# streaming/ runs the same plans with readStream + watermark)
# ===========================================================================


@query(
    "x5_tumbling_hourly",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def x5_tumbling_hourly(spark, sf_dir):
    """X5 tumbling event-time window (1h) per event_type.  Identical plan
    runs under Structured Streaming with a watermark
    (streaming/events_stream.py)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


@query(
    "x5_sliding_counts",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                - k * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events, (VALUES (0), (1)) t(k)
GROUP BY 1, 2
""",
)
def x5_sliding_counts(spark, sf_dir):
    """X5 sliding event-time windows (1h window / 30min slide) — batch twin
    of streaming/events_stream.sliding_counts.  The oracle replays Spark's
    pane assignment by generating both covering slide offsets per event
    (every event lands in window/slide = 2 panes)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@query(
    "x5_session_windows",
    oracle="""
WITH gaps AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL '10 minutes'
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
    FROM gaps
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def x5_session_windows(spark, sf_dir):
    """X5 session windows (10-minute gap) per user — Spark's native
    session_window; the oracle reconstructs identical sessions with
    lag + cumulative-sum (new session iff gap >= 10min, matching Spark's
    exclusive session-end semantics)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
        )
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


# ===========================================================================
# X6 — deterministic dataset splits & sampling (training-data pipelines)
# ===========================================================================


@query(
    "x6_hash_split",
    oracle="""
SELECT doc_id,
       CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT) AS bucket,
       CASE WHEN ((doc_id % 2147483647) * 2654435761) % 1000 < 800 THEN 'train'
            WHEN ((doc_id % 2147483647) * 2654435761) % 1000 < 900 THEN 'val'
            ELSE 'test' END AS split,
       lang
FROM documents
""",
)
def x6_hash_split(spark, sf_dir):
    """X6 deterministic train/val/test split (800/100/100 per-mille) from a
    multiplicative hash of doc_id — a narrow no-shuffle projection, stable
    under repartitioning and incremental appends
    (operators/sampling.py:hash_split)."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.hash_split(docs, "doc_id").select("doc_id", "bucket", "split", "lang")


@query(
    "x6_stratified_sample",
    oracle="""
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT), doc_id
           ) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= CEIL(n * 0.1)
""",
)
def x6_stratified_sample(spark, sf_dir):
    """X6 exact deterministic stratified sample: 10% per language via
    rank-over-hash (one shuffle; both windows share the lang partitioning).
    Unlike sampleBy (Bernoulli RNG), counts are exact and reproducible
    (operators/sampling.py:stratified_sample)."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.stratified_sample(docs, "lang", id_col="doc_id", fraction=0.1)


@query(
    "x6_weighted_sample",
    oracle="""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           CAST(n_chars AS DOUBLE)
             / ((CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT) + 1) / 1000.0)
             AS priority
    FROM documents
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY priority DESC, doc_id ASC
    ) AS rn
    FROM keyed
)
SELECT doc_id, lang, n_chars, priority FROM ranked WHERE rn <= 20
""",
)
def x6_weighted_sample(spark, sf_dir):
    """X6 deterministic weighted sample, 20 docs per language, via priority
    sampling (Duffield-Lund-Thorup): priority = n_chars / u with u a
    deterministic hash-uniform; token-heavy docs win proportionally more.
    One shuffle on lang; WindowGroupLimit keeps per-partition top-k
    map-side.  Priorities are single correctly-rounded IEEE divisions, so
    the DuckDB oracle reproduces them bit-for-bit
    (operators/sampling.py:weighted_priority_sample)."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_priority_sample(
        docs, "n_chars", id_col="doc_id", k=20, group_cols=["lang"]
    )


# ===========================================================================
# X7 — SCD2 history derivation (warehouse-history form of the reference's
# CL_STATUS_HISTORY consumption)
# ===========================================================================


#: full-recompute SCD2 oracle over the whole event log — shared by the
#: derivation entry (x7) and the incremental-apply entry (x10_scd2_apply),
#: whose whole point is that applying a later batch incrementally must equal
#: this full recompute bit-for-bit.
_SCD2_FULL_RECOMPUTE_ORACLE = """
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS _prev
    FROM events
),
changes AS (
    SELECT user_id, ts, event_id, event_type
    FROM ordered WHERE _prev IS NULL OR event_type <> _prev
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM changes
"""


@query("x7_scd2_status_intervals", oracle=_SCD2_FULL_RECOMPUTE_ORACLE)
def x7_scd2_status_intervals(spark, sf_dir):
    """X7 SCD2 interval derivation over the status-history event log:
    collapse consecutive same-status events, open/close validity intervals
    with lag/lead over ONE (user_id, ts) partitioning
    (operators/history.py:scd2_intervals)."""
    from .operators import history

    iv = history.scd2_intervals(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type", tiebreak="event_id"
    )
    return iv.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        "is_current",
    )


# ===========================================================================
# round-2 curation additions: duplicate clustering, decontamination,
# shard packing, TF-IDF, k-means
# ===========================================================================


@query(
    "x1_dup_clusters",
    oracle=r"""
WITH RECURSIVE sh AS (
    SELECT doc_id AS id,
           CASE WHEN len(toks) >= 2
                THEN list_distinct([toks[i] || ' ' || toks[i+1]
                                    for i in generate_series(1, len(toks) - 1)])
                ELSE list_distinct(toks) END AS sh
    FROM (
        SELECT doc_id,
               regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS toks
        FROM documents WHERE doc_id < 200
    ) t
),
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b
    FROM sh a JOIN sh b ON a.id < b.id
    WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE, 6) >= 0.4
),
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b AS a, id_a AS b FROM pairs
),
reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents WHERE doc_id < 200
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
)
SELECT src AS doc_id, MIN(dst) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
""",
)
def x1_dup_clusters(spark, sf_dir):
    """X1 duplicate CLUSTERING: near-dup pairs (exact bigram Jaccard >=
    0.4, bounded id range as ground truth) closed under transitivity via
    iterative min-label propagation (operators/graph.py:connected_components)
    — every doc labeled with the min id of its duplicate group, singletons
    labeling themselves.  The DuckDB oracle computes the same fixpoint with
    a recursive CTE, so the iterative DataFrame loop is verified against a
    declarative transitive closure."""
    from .operators import dedup, graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.4, max_id=200)
    nodes = docs.filter(F.col("doc_id") < 200).select(F.col("doc_id").alias("id"))
    comp = graph.connected_components(pairs, nodes)
    return comp.select(F.col("node").alias("doc_id"), "cluster_id").orderBy("doc_id")


@query(
    "x6_decontaminate",
    oracle=r"""
WITH base AS (
    SELECT doc_id, CAST(((doc_id % 2147483647) * 2654435761) % 1000 AS INT) AS bucket,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id, bucket,
           unnest(CASE WHEN len(toks) >= 3
                       THEN list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                           for i in generate_series(1, len(toks) - 2)])
                       ELSE list_distinct(toks) END) AS shingle
    FROM base
),
tr AS (SELECT doc_id, shingle FROM sh WHERE bucket < 800),
te AS (SELECT doc_id, shingle FROM sh WHERE bucket >= 900)
SELECT tr.doc_id,
       COUNT(DISTINCT tr.shingle) AS n_shared_grams,
       COUNT(DISTINCT te.doc_id) AS n_test_docs
FROM tr JOIN te ON tr.shingle = te.shingle
GROUP BY tr.doc_id
ORDER BY tr.doc_id
""",
)
def x6_decontaminate(spark, sf_dir):
    """X6 benchmark decontamination: flag TRAIN documents (hash_split
    train bucket) sharing any word trigram with any TEST document — the
    n-gram-overlap contamination check run before training.  One equi-join
    on the gram text between two zero-shuffle shingle projections
    (operators/dedup.py:contamination_report); the split assignment is the
    portable Knuth hash so the oracle reproduces it exactly."""
    from .operators import dedup, sampling

    docs = load_table(spark, sf_dir, "documents")
    split = sampling.hash_split(docs, "doc_id")
    train = split.filter(F.col("split") == "train").select("doc_id", "text")
    test = split.filter(F.col("split") == "test").select("doc_id", "text")
    return (
        dedup.contamination_report(train, test, "doc_id", "text", n=3)
        .orderBy("doc_id")
    )


@query(
    "x6_pack_shards",
    oracle=r"""
WITH sized AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
    FROM documents
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                   - n_tokens) / 500.0) AS INT) AS shard_id
FROM sized ORDER BY doc_id
""",
)
def x6_pack_shards(spark, sf_dir):
    """X6 shard packing: documents in id order, new shard every ~500
    tokens (exclusive-prefix-sum DIV budget) — training-shard assembly.
    The prefix sum is DISTRIBUTED (operators/sampling.py:pack_shards):
    deterministic id-range buckets -> per-bucket windows + a tiny
    bucket-offset window — no single-partition global window; the oracle
    states the same math as one declarative cumsum."""
    from .operators import sampling

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("int").alias("n_tokens"),
    )
    return sampling.pack_shards(
        docs, id_col="doc_id", size_col="n_tokens", budget=500, ids_per_bucket=100
    ).orderBy("doc_id")


@query(
    "x3_tfidf_top_terms",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, COUNT(*) AS tf
    FROM toks WHERE token <> '' GROUP BY doc_id, token
),
dfreq AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS c FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf,
           round(tf.tf * ln((n.c + 1.0) / (dfreq.df_t + 1.0)), 6) AS score
    FROM tf CROSS JOIN n JOIN dfreq ON dfreq.token = tf.token
)
SELECT doc_id, token, tf, score, rank
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, token) AS INT) AS rank
      FROM scored)
WHERE rank <= 3
ORDER BY doc_id, rank
""",
)
def x3_tfidf_top_terms(spark, sf_dir):
    """X3 TF-IDF top terms per document: one explode + (doc, token)
    aggregation; document frequencies derived from that aggregate (not a
    second corpus scan) and broadcast back; one doc-partitioned window
    for the top-3 (operators/text.py:tfidf_top_terms).  All arithmetic is
    scalar double expressions — no order-sensitive float aggregation — so
    the result is exactly oracle-checkable."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, "text", k=3).orderBy("doc_id", "rank")


def _kmeans_clusters_oracle(k: int = 8, n_assign: int = 4, dp: int = 6, dim: int = 64) -> str:
    """DuckDB replay of the FULL fixed-iteration Lloyd's loop: chained
    CTEs — assignment t from centroids t-1 (ROW_NUMBER ties to the lowest
    cluster = Spark's least + first-equal rule), centroids t =
    round(AVG, dp) per (cluster, pos) with COALESCE keeping empty
    clusters' previous centroid.  Rounding the means to ``dp`` decimals is
    what makes the loop engine-portable: AVG partial-sum order differs
    across engines/partitionings in the last ulp, and the rounding snaps
    both sides to the same decimal before the next assignment round (the
    x2_group_centroids / rounded-cosine trick applied iteratively).
    ``n_assign`` assignment CTEs with ``n_assign - 1`` interleaved
    updates replay Spark's ``kmeans_fit(n_iter=n_assign - 1)`` exactly
    (the loop runs n_iter assignment+update rounds, then one final
    assignment against the last centroids)."""
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        f"""c0 AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v AS cv
    FROM e ORDER BY vec_id LIMIT {k}
)""",
    ]
    for t in range(1, n_assign + 1):
        parts.append(f""", a{t} AS (
    SELECT vec_id, cluster FROM (
        SELECT e.vec_id, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                             for i in generate_series(1, {dim})]) ASC,
                   c.cluster ASC) AS rn
        FROM e CROSS JOIN c{t - 1} c
    ) WHERE rn = 1
)""")
        if t == n_assign:
            break
        parts.append(f""", m{t} AS (
    SELECT a.cluster, CAST(i AS INT) AS pos, round(AVG(e.v[i]), {dp}) AS m
    FROM a{t} a JOIN e USING (vec_id)
    CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i)
    GROUP BY a.cluster, i
), c{t} AS (
    SELECT p.cluster, COALESCE(n.cv, p.cv) AS cv
    FROM c{t - 1} p LEFT JOIN (
        SELECT cluster, list(m ORDER BY pos) AS cv FROM m{t} GROUP BY cluster
    ) n USING (cluster)
)""")
    parts.append(f"\nSELECT vec_id, cluster FROM a{n_assign}")
    return "".join(parts)


@query("x8_kmeans_clusters", oracle=_kmeans_clusters_oracle())
def x8_kmeans_clusters(spark, sf_dir):
    """X8 embedding k-means (Lloyd's, k=8, 3 iterations, deterministic
    lowest-id init — operators/clustering.py): per-vector cluster
    assignment.  ``round_dp=6`` snaps each updated centroid mean to 6
    decimals before the next assignment round, which makes the whole
    fixed-iteration loop replayable by the chained-CTE ANSI-SQL oracle
    (and layout-stable: a float mean is the loop's one order-sensitive
    reduction).  tests/test_curation_ops.py additionally verifies the
    raw (un-rounded) loop against a NumPy reference implementation.

    Note: Spark runs n_iter full assignment+update rounds and then one
    FINAL assignment against the last centroids; the oracle mirrors that
    as n_iter assignment CTEs with n_iter-1 interleaved updates — the
    same loop unrolled."""
    from .operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    _, assign = clustering.kmeans_fit(
        emb, "vec_id", "embedding", k=8, n_iter=3, round_dp=6
    )
    return assign.select(F.col("id").alias("vec_id"), "cluster").orderBy("vec_id")


@query(
    "x9_curation_pipeline",
    oracle=rf"""
WITH t AS (
    SELECT doc_id, text,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           regexp_split_to_array(trim(lower(text)), '\s+') AS ltoks,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           length(text) AS n_chars
    FROM documents
),
scored AS (
    SELECT doc_id, norm,
           CAST(len(toks) AS INT) AS n_tokens,
           round(0.4 * (len(list_filter(toks, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
                        / len(toks)::DOUBLE)
                 + 0.3 * (1.0 - n_punct::DOUBLE / n_chars::DOUBLE)
                 + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0), 6) AS quality_score,
           {_LANG_SCORE_SQL.replace("toks", "ltoks")}
    FROM t
),
filtered AS (
    SELECT * FROM scored
    WHERE quality_score >= 0.5
      AND {_LANG_CASE} = 'en'
),
survivors AS (
    SELECT MIN(doc_id) AS doc_id, arg_min(n_tokens, doc_id) AS n_tokens
    FROM filtered GROUP BY norm
),
tr AS (
    SELECT s.doc_id, s.n_tokens FROM survivors s
    WHERE ((s.doc_id % 2147483647) * 2654435761) % 1000 < 800
),
base AS (
    SELECT doc_id,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) >= 5
                       THEN list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                           || ' ' || toks[i+3] || ' ' || toks[i+4]
                                           for i in generate_series(1, len(toks) - 4)])
                       ELSE list_distinct(toks) END) AS shingle
    FROM base
),
contaminated AS (
    SELECT DISTINCT a.doc_id
    FROM sh a
    JOIN tr ON tr.doc_id = a.doc_id
    JOIN sh b ON a.shingle = b.shingle
    JOIN documents d ON d.doc_id = b.doc_id AND ((d.doc_id % 2147483647) * 2654435761) % 1000 >= 900
),
clean AS (
    SELECT tr.doc_id, tr.n_tokens FROM tr
    WHERE tr.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                   - n_tokens) / 500.0) AS INT) AS shard_id
FROM clean ORDER BY doc_id
""",
)
def x9_curation_pipeline(spark, sf_dir):
    """X9 END-TO-END curation pipeline, composed from the operator
    library: quality filter + language filter + exact dedup
    (text.training_data_prep) -> deterministic train split
    (sampling.hash_split) -> benchmark decontamination against the test
    split (dedup.decontaminate, 5-gram overlap — trigrams flag ~95% of
    this boilerplate-heavy fixture corpus; 5-grams ~1%) -> token-budget shard
    packing (sampling.pack_shards).  Output: (doc_id, n_tokens, shard_id)
    — the training-shard manifest.

    This is the full C4/Gopher-style corpus -> training-shards flow as ONE
    lazy DAG: Catalyst sees every stage, so column pruning and filter
    pushdown cross stage boundaries; the oracle chains the same steps
    declaratively and checks the composition end-to-end, not just the
    pieces."""
    from .operators import dedup, sampling, text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    prep = text_ops.training_data_prep(docs, min_quality=0.5, lang="en")
    surv = sampling.hash_split(prep.select("doc_id", "n_tokens"), "doc_id")
    train = (
        surv.filter(F.col("split") == "train")
        .select("doc_id", "n_tokens")
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    test = (
        sampling.hash_split(docs.select("doc_id", "text"), "doc_id")
        .filter(F.col("split") == "test")
        .select("doc_id", "text")
    )
    clean = dedup.decontaminate(train, test, "doc_id", "text", n=5).select(
        "doc_id", "n_tokens"
    )
    return sampling.pack_shards(
        clean, id_col="doc_id", size_col="n_tokens", budget=500, ids_per_bucket=100
    ).orderBy("doc_id")


@query(
    "x5_enriched_events",
    oracle="""
WITH dim(event_type, category) AS (
    VALUES ('click', 'ui'), ('view', 'ui'), ('purchase', 'commerce'),
           ('signup', 'account'), ('error', 'ops')
)
SELECT e.event_id, e.event_type,
       COALESCE(d.category, 'unknown') AS category
FROM events e LEFT JOIN dim d ON d.event_type = e.event_type
ORDER BY e.event_id
""",
)
def x5_enriched_events(spark, sf_dir):
    """X5 stream-static enrichment, BATCH TWIN of
    streaming.events_stream.enrich_stream_with_dimension (same join
    expression; the streaming flavor replays to the identical result under
    availableNow — tests/test_streaming.py).  The dimension broadcasts;
    the stream side never holds state."""
    from .streaming import events_stream as es

    dim = spark.createDataFrame(
        [
            ("click", "ui"),
            ("view", "ui"),
            ("purchase", "commerce"),
            ("signup", "account"),
            ("error", "ops"),
        ],
        ["event_type", "category"],
    )
    events = load_table(spark, sf_dir, "events")
    return (
        es.enrich_stream_with_dimension(events, dim, on="event_type")
        .select(
            "event_id",
            "event_type",
            F.coalesce(F.col("category"), F.lit("unknown")).alias("category"),
        )
        .orderBy("event_id")
    )


@query(
    "x4_frame_sample",
    oracle=r"""
WITH b AS (
    SELECT doc_id, text, length(text) AS n,
           greatest(length(text) // 4, 1) AS step
    FROM documents WHERE doc_id < 200
),
f AS (
    SELECT doc_id, text, n,
           k, least(k * step, greatest(n - 1, 0)) AS off
    FROM b CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
)
SELECT doc_id,
       CAST(k AS INT) AS frame_idx,
       CAST(off AS BIGINT) AS frame_offset,
       '[' || array_to_string(
         [CAST(coalesce(list_sum([ascii(text[i])
                                  for i in generate_series(off + 1 + d,
                                                           least(off + 64, n), 4)]), 0)
               % 1000 AS VARCHAR)
          for d in generate_series(0, 3)], ',') || ']' AS feature_json
FROM f
ORDER BY doc_id, frame_idx
""",
)
def x4_frame_sample(spark, sf_dir):
    """X4 frame sampling: each media row fans out to 4 evenly-spaced
    'frame' windows via one Arrow-batched mapInPandas pass (video ->
    frame-features shape; decode honestly stubbed, offsets + features
    deterministic).  Fan-out happens inside the Arrow batch — no shuffle.
    The per-frame feature is an integer byte-sum signature, replicated
    exactly by the DuckDB oracle (window arithmetic + nested comprehension
    over ascii codes), so the one-row-in/many-rows-out plumbing gets a full
    value-hash check.  tests/test_curation_ops.py pins fan-out arity and
    determinism."""
    from .operators import multimodal

    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    return (
        multimodal.sample_frames(media, n_frames=4)
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id", "frame_idx")
    )


# ===========================================================================
# W3-W5 window breadth, grouping sets, pivot (classic OLAP surface)
# ===========================================================================


@query(
    "w3_running_user_metrics",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
            PARTITION BY user_id ORDER BY epoch(ts)
            RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_7d,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS INT) AS value_quartile,
       round(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS value_pctrank
FROM events
WHERE user_id < 50
ORDER BY user_id, seq
""",
)
def w3_running_user_metrics(spark, sf_dir):
    """W3-W5 window breadth: a 7-day RANGE-frame running sum (event-time
    sliding aggregate), NTILE quartiles and PERCENT_RANK — all FOUR window
    functions share ONE user_id partitioning (different orderings re-sort
    within partitions but never re-shuffle).  The range frame orders by
    epoch seconds so Spark's rangeBetween (long offsets) and DuckDB's
    RANGE INTERVAL semantics meet on the identical integer frame."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    epoch = F.unix_timestamp("ts")
    w_range = (
        Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-604800, 0)
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            F.sum(F.col("value").cast("decimal(38,6)")).over(w_range)
            .cast("double")
            .alias("value_7d"),
            F.row_number().over(w_seq).cast("int").alias("seq"),
            F.ntile(4).over(w_val).cast("int").alias("value_quartile"),
            F.round(F.percent_rank().over(w_val), 6).alias("value_pctrank"),
        )
        .orderBy("user_id", "seq")
    )


@query(
    "a5_rollup_revenue",
    oracle="""
SELECT COALESCE(r.r_name, 'ALL') AS region_name,
       COALESCE(n.n_name, 'ALL') AS nation_name,
       CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS INT) AS gid,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY gid, region_name, nation_name
""",
)
def a5_rollup_revenue(spark, sf_dir):
    """A5 grouping sets: revenue at nation, region and grand-total levels
    in ONE pass via ROLLUP — the multi-granularity aggregation an OLAP
    cube needs without three separate scans.  GROUPING() bits pin the
    level id identically on both engines; NULL group keys render as
    'ALL'.  Scale: rollup is a single expanded aggregation — one shuffle,
    partial aggregation still applies."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    gid = (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("int")
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("revenue"),
            gid.alias("gid"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "gid",
            "revenue",
        )
        .orderBy("gid", "region_name", "nation_name")
    )


@query(
    "a6_priority_pivot",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN
                ('1-URGENT','2-HIGH','3-MEDIUM') THEN 1 ELSE 0 END) AS BIGINT) AS other
FROM orders
GROUP BY o_year
ORDER BY o_year
""",
)
def a6_priority_pivot(spark, sf_dir):
    """A6 pivot: order counts per year spread across priority columns —
    ``groupBy().pivot(values=[...])`` with an EXPLICIT value list (never
    the two-pass distinct-discovery form at scale) plus an 'other'
    bucket.  A pivot with a known value list compiles to exactly the
    CASE-sum aggregation the oracle states: one shuffle, map-side
    partials."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .when(F.col("o_orderpriority") == "2-HIGH", "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("other")
    )
    return (
        o.select(F.year("o_orderdate").cast("int").alias("o_year"), bucket.alias("b"))
        .groupBy("o_year")
        .pivot("b", ["urgent", "high", "medium", "other"])
        .count()
        .fillna(0)
        .orderBy("o_year")
    )


@query(
    "u2_setops_repeat_customers",
    oracle="""
WITH c97 AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
c98 AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
)
SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c97 INTERSECT SELECT * FROM c98)
UNION ALL
SELECT 'only_1997' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c98)
UNION ALL
SELECT 'only_1998' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c98 EXCEPT SELECT * FROM c97)
ORDER BY cohort
""",
)
def u2_setops_repeat_customers(spark, sf_dir):
    """U2 set-operation breadth: INTERSECT / EXCEPT / UNION ALL over
    year-cohort customer keys — retained vs churned vs new-customer
    counts.  Set ops on DISTINCT key sets plan as semi/anti joins on one
    key column (slim shuffles); the year filters push to the orders
    scan."""
    o = load_table(spark, sf_dir, "orders")
    def cohort(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )
    c97, c98 = cohort(1997), cohort(1998)
    both = c97.intersect(c98).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only97 = c97.exceptAll(c98).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1997").alias("cohort"), "n"
    )
    only98 = c98.exceptAll(c97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1998").alias("cohort"), "n"
    )
    return both.unionByName(only97).unionByName(only98).orderBy("cohort")


@query(
    "f8_scalar_breadth",
    oracle="""
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(datediff('day', CAST('1995-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS order_quarter,
       CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS order_dow,
       upper(substr(o_orderpriority, 3)) AS priority_word,
       CAST(length(o_orderstatus) AS INT) AS status_len,
       concat(o_orderstatus, '/', o_orderpriority) AS status_priority,
       replace(o_orderpriority, '-', '_') AS priority_snake,
       CAST(round(o_totalprice, -2) AS DOUBLE) AS price_rounded,
       CAST(CASE WHEN o_totalprice >= 0 THEN floor(sqrt(o_totalprice)) ELSE NULL END AS BIGINT) AS price_sqrt_floor
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
)
def f8_scalar_breadth(spark, sf_dir):
    """F8 scalar-function breadth (§2.8 completeness): date_trunc,
    day-diff, quarter/day-of-week extraction, substring/upper/concat/
    replace string derivations, round-to-hundreds and integer sqrt — every
    expression a built-in (JVM codegen, no UDF), each aliased identically
    to the oracle.  DOW convention pinned: both engines number Sunday=0
    via dayofweek()-1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (
        o.select(
            "o_orderkey",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("int")
            .alias("days_since_epoch_start"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
            F.upper(F.substring("o_orderpriority", 3, 100)).alias("priority_word"),
            F.length("o_orderstatus").cast("int").alias("status_len"),
            F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_priority"),
            F.regexp_replace("o_orderpriority", "-", "_").alias("priority_snake"),
            F.round(F.col("o_totalprice"), -2).cast("double").alias("price_rounded"),
            F.when(F.col("o_totalprice") >= 0, F.floor(F.sqrt("o_totalprice")))
            .cast("bigint")
            .alias("price_sqrt_floor"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "f10_array_funcs",
    oracle="""
WITH g AS (
    SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qty_arr
    FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qty_arr) AS INT) AS n_items,
       array_to_string(qty_arr, ',') AS qty_csv,
       array_to_string(qty_arr[1:3], ',') AS top3_csv,
       COALESCE(array_to_string(list_filter(qty_arr, x -> x % 2 = 0), ','), '') AS even_csv,
       CAST(list_sum(list_transform(qty_arr, x -> x * 2)) AS BIGINT) AS doubled_sum,
       CAST(len(list_distinct(qty_arr)) AS INT) AS n_distinct,
       CAST(list_max(qty_arr) AS INT) AS max_qty,
       CAST(list_contains(qty_arr, 10) AS INT) AS has_ten
FROM g
ORDER BY l_orderkey
""",
)
def f10_array_funcs(spark, sf_dir):
    """F10 array / higher-order function breadth: collect_list +
    array_sort aggregation, then slice, lambda filter, transform-and-fold
    (``aggregate``), array_distinct, array_max, array_contains — the
    complex-type layer a curation pipeline leans on for shingles, token
    lists, and embedding manipulation.  Every lambda runs JVM-side
    (Catalyst higher-order functions, no Python); arrays leave the query
    as CSV strings so the driver canon stays scalar
    (oracle: DuckDB list_* equivalents)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("int"))).alias("qty_arr")
    )
    return g.select(
        "l_orderkey",
        F.size("qty_arr").cast("int").alias("n_items"),
        F.array_join(F.col("qty_arr").cast("array<string>"), ",").alias("qty_csv"),
        F.array_join(F.slice("qty_arr", 1, 3).cast("array<string>"), ",").alias(
            "top3_csv"
        ),
        F.array_join(
            F.filter("qty_arr", lambda x: x % 2 == 0).cast("array<string>"), ","
        ).alias("even_csv"),
        F.aggregate(
            "qty_arr", F.lit(0).cast("bigint"), lambda acc, x: acc + x * 2
        ).alias("doubled_sum"),
        F.size(F.array_distinct("qty_arr")).cast("int").alias("n_distinct"),
        F.array_max("qty_arr").cast("int").alias("max_qty"),
        F.array_contains("qty_arr", F.lit(10)).cast("int").alias("has_ten"),
    ).orderBy("l_orderkey")


# ===========================================================================
# X5 gap-fill, grouped-UDAF median, null-safe join, fuzzy match, CUBE
# ===========================================================================


@query(
    "x5_gap_fill_hourly",
    oracle="""
WITH h AS (
    SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hr,
           SUM(CAST(value AS DECIMAL(38,6))) AS v_dec
    FROM events WHERE user_id < 20 GROUP BY 1, 2
),
b AS (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM h GROUP BY user_id),
spine AS (
    SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hr
    FROM b
),
j AS (
    SELECT s.user_id, s.hr, h.v_dec
    FROM spine s LEFT JOIN h ON s.user_id = h.user_id AND s.hr = h.hr
)
SELECT user_id,
       strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(v_dec IS NOT NULL AS INT) AS observed,
       CAST(last_value(v_dec IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS v_filled
FROM j
""",
)
def x5_gap_fill_hourly(spark, sf_dir):
    """X5 hypertable-style gap fill: densify each user's hourly series over
    its own [min, max] hour range (``sequence`` + ``explode`` — the spine is
    generated from one slim per-user aggregate, never materialized wide),
    left-join the observed hourly sums back, and forward-fill gaps with
    ``last(..., ignorenulls)`` over the user partition.  One shuffle on
    user_id serves the agg, the spine join, and the fill window; the spine
    side is tiny (per-user bounds) so AQE broadcasts it.  Decimal-accumulate
    / final-double per the driver-canon convention."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(F.col("value").cast("decimal(38,6)")).alias("v_dec"))
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return spine.join(hourly, ["user_id", "hr"], "left").select(
        "user_id",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v_dec").isNotNull().cast("int").alias("observed"),
        F.last("v_dec", ignorenulls=True).over(w).cast("double").alias("v_filled"),
    )


@query(
    "x3_grouped_median",
    oracle="""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(median(n_chars) AS DOUBLE) AS median_chars
FROM documents
GROUP BY lang, source
""",
)
def x3_grouped_median(spark, sf_dir):
    """X3 exact grouped median via ``applyInPandas`` — the Arrow-batched
    grouped-UDAF escape hatch, exercised against a real DuckDB oracle (the
    only such path with a full value-hash check; kmeans/decode are
    rows-only).  Each (lang, source) group arrives as ONE pandas frame;
    np.median's even-count linear interpolation matches DuckDB's median()
    exactly on integer inputs.  Production note: for a plain median Spark's
    built-in ``F.median`` stays JVM-side and is preferred — this entry
    exists to pin the applyInPandas contract (schema, grouping, Arrow
    batches) that genuinely-custom per-group logic needs."""
    import pandas as pd

    def _med(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        return pd.DataFrame(
            [
                {
                    "lang": key[0],
                    "source": key[1],
                    "n_docs": len(pdf),
                    "median_chars": float(np.median(pdf["n_chars"].to_numpy())),
                }
            ]
        )

    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .applyInPandas(
            _med, schema="lang string, source string, n_docs bigint, median_chars double"
        )
    )


@query(
    "j7_nullsafe_join",
    oracle="""
WITH c2 AS (
    SELECT c_custkey, c_acctbal,
           CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
                ELSE c_mktsegment END AS seg
    FROM customer
),
l AS (SELECT seg, COUNT(*) AS n_cust FROM c2 GROUP BY seg),
r AS (SELECT seg,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
      FROM c2 GROUP BY seg)
SELECT COALESCE(l.seg, '<null>') AS segment, l.n_cust, r.sum_bal
FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
""",
)
def j7_nullsafe_join(spark, sf_dir):
    """J7 null-safe equi-join (``eqNullSafe`` <=> / IS NOT DISTINCT FROM):
    NULL join keys match each other instead of dropping — the semantics a
    plain equi-join silently loses.  Catalyst still plans this as a hash
    join (null-safe equality is a valid hash key), not a nested loop; both
    sides here are one-row-per-segment aggregates, so the join broadcasts."""
    c2 = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    l = c2.groupBy("seg").agg(F.count(F.lit(1)).alias("n_cust")).alias("l")
    r = (
        c2.groupBy("seg")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_bal")
        )
        .alias("r")
    )
    return l.join(r, F.col("l.seg").eqNullSafe(F.col("r.seg"))).select(
        F.coalesce(F.col("l.seg"), F.lit("<null>")).alias("segment"),
        "n_cust",
        "sum_bal",
    )


@query(
    "f9_levenshtein_match",
    oracle="""
SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_dist
FROM supplier a
JOIN supplier b
  ON right(a.s_name, 1) = right(b.s_name, 1)
 AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
""",
)
def f9_levenshtein_match(spark, sf_dir):
    """F9 fuzzy entity matching: blocked Levenshtein self-join on supplier
    names.  The blocking key (last name char) turns an all-pairs O(n^2)
    comparison into an equi-join with ~n/100-sized buckets — the standard
    record-linkage shape; at 100 TB the block key would be a phonetic or
    n-gram key but the plan is identical.  ``levenshtein`` is a JVM built-in
    (codegen), evaluated only on in-block pairs."""
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.expr("right(s_name, 1)").alias("blk")
    )
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .filter(F.levenshtein(F.col("a.s_name"), F.col("b.s_name")) <= 2)
        .select(
            F.col("a.s_suppkey").alias("key_a"),
            F.col("b.s_suppkey").alias("key_b"),
            F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
            .cast("int")
            .alias("edit_dist"),
        )
    )


@query(
    "a7_cube_summary",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def a7_cube_summary(spark, sf_dir):
    """A7 CUBE grouping sets (completes the ROLLUP/pivot family from a5/a6):
    all 4 grouping combinations of (status, priority) in ONE scan — Spark
    expands the cube map-side, so the input is read once and each partial
    aggregate combines before the single shuffle.  Grouping-key NULLs are
    sentinel-coalesced identically on both sides (the columns are non-null
    in the data, so 'ALL' is unambiguous)."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "x5_view_click_attribution",
    oracle="""
SELECT v.event_id AS view_id,
       c.event_id AS click_id,
       v.user_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view'
 AND c.event_type = 'click'
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL '30 minutes'
""",
)
def x5_view_click_attribution(spark, sf_dir):
    """X5 interval join (batch twin of the stream-stream attribution join,
    streaming/events_stream.view_click_interval_join): clicks matched to
    same-user views within 30 minutes.  Plans as ONE user_id shuffle shared
    by both sides plus a range predicate evaluated post-join — the
    watermarked streaming form holds the identical shape with bounded state.
    tests/test_streaming.py asserts the availableNow replay of the streaming
    join equals this query row-for-row."""
    from .streaming.events_stream import view_click_interval_join

    e = _t(spark, sf_dir, "events")
    return view_click_interval_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "click"),
    )


@query(
    "x10_cdc_merge",
    oracle="""
WITH ch AS (
    SELECT o_custkey AS k, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
),
latest AS (SELECT k, o_totalprice FROM ch WHERE rn = 1),
upd AS (
    SELECT k AS c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           CAST(o_totalprice AS DECIMAL(38,6)) AS c_acctbal,
           CASE WHEN k % 97 = 0 THEN 'D' ELSE 'U' END AS op
    FROM latest
),
ins AS (
    SELECT -k AS c_custkey,
           'Customer#new' || CAST(k AS VARCHAR) AS c_name,
           CAST(o_totalprice AS DECIMAL(38,6)) AS c_acctbal,
           'I' AS op
    FROM latest WHERE k % 89 = 0
),
chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
m AS (
    SELECT COALESCE(g.c_custkey, b.c_custkey) AS c_custkey,
           COALESCE(g.c_name, b.c_name) AS c_name,
           COALESCE(g.c_acctbal, CAST(b.c_acctbal AS DECIMAL(38,6))) AS bal,
           g.op
    FROM customer b FULL JOIN chg g ON b.c_custkey = g.c_custkey
)
SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS balance
FROM m
WHERE op IS NULL OR op <> 'D'
""",
)
def x10_cdc_merge(spark, sf_dir):
    """X10 CDC merge-apply (operators/cdc.py): a deterministic change feed
    derived from each customer's latest order — balance updates for all,
    deletes for custkey % 97 == 0, synthetic inserts (negated key) for
    custkey % 89 == 0 — applied to the customer base table with full MERGE
    semantics in ONE full-outer join.  Update rows carry NULL c_name to
    exercise the partial-row column-wise coalesce path."""
    from .operators.cdc import merge_apply

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("decimal(38,6)").alias("c_acctbal")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", "o_orderdate", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("k"), "o_totalprice")
    )
    upd = latest.select(
        F.col("k").alias("c_custkey"),
        F.lit(None).cast("string").alias("c_name"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("c_acctbal"),
        F.when(F.col("k") % 97 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    ins = latest.filter(F.col("k") % 89 == 0).select(
        (-F.col("k")).alias("c_custkey"),
        F.concat(F.lit("Customer#new"), F.col("k").cast("string")).alias("c_name"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("c_acctbal"),
        F.lit("I").alias("op"),
    )
    merged = merge_apply(base, upd.unionByName(ins), key="c_custkey")
    return merged.select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("balance")
    )


@query(
    "x3_ngram_lm_score",
    oracle="""
WITH t AS (SELECT doc_id, lang, lower(text) AS s FROM documents),
idx AS (
    SELECT doc_id, lang, s, unnest(generate_series(1, length(s) - 2)) AS i
    FROM t WHERE length(s) >= 3
),
tri AS (SELECT doc_id, lang, substr(s, i, 3) AS g FROM idx),
model AS (
    SELECT g, c FROM (
        SELECT g, COUNT(*) AS c FROM tri WHERE lang = 'en' GROUP BY g
    ) ORDER BY c DESC, g LIMIT 4096
),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot FROM model),
j AS (
    SELECT tri.doc_id, CAST(COALESCE(model.c, 0.5) AS DOUBLE) AS c, tot.tot
    FROM tri LEFT JOIN model USING (g) CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       round(AVG(ln(c / tot)), 6) AS lm_score
FROM j GROUP BY doc_id
""",
)
def x3_ngram_lm_score(spark, sf_dir):
    """X3 n-gram language-model quality score (perplexity-style fluency
    filter): a char-trigram unigram LM is trained on the in-corpus English
    slice, then every document is scored by its mean trigram
    log-probability (unseen trigrams floored at count 0.5).  Scale shape:
    the model vocabulary is CAPPED at the top-4096 trigrams by count
    (deterministic count-desc/gram-asc tiebreak, one TakeOrderedAndProject)
    so the broadcast build side is provably bounded at ANY corpus size —
    charset^3 is fine for ASCII but unbounded on a multilingual (CJK)
    100-TB corpus; out-of-vocabulary trigrams take the unseen floor, which
    is exactly the LM semantics.  Trigram expansion is a map-side
    ``transform(sequence(...))`` (one pass, no per-row Python), and the
    only data-sized shuffles are the model groupBy and the per-doc score
    groupBy.  Scores rounded to 6 dp on both sides: libm vs JVM ``ln`` and
    summation order differ below 1e-12, far inside the rounding guard."""
    vocab_cap = 4096
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.lower("text").alias("s")
    )
    tri = t.filter(F.length("s") >= 3).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))")
        ).alias("g"),
    )
    model = (
        tri.filter(F.col("lang") == "en")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("g"))
        .limit(vocab_cap)
    )
    tot = model.agg(F.sum("c").cast("double").alias("tot"))
    return (
        tri.join(F.broadcast(model), "g", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(
                F.avg(F.log(F.coalesce(F.col("c"), F.lit(0.5)).cast("double") / F.col("tot"))),
                6,
            ).alias("lm_score"),
        )
    )


@query(
    "x4_audio_chunks",
    oracle=r"""
WITH b AS (
    SELECT doc_id, text, length(text) AS n FROM documents
    WHERE doc_id < 200 AND length(text) > 0
),
c AS (
    SELECT doc_id, text, n,
           unnest(generate_series(0, CAST(ceil(n / 192.0) AS INT) - 1)) AS idx
    FROM b
)
SELECT doc_id,
       CAST(idx AS INT) AS chunk_idx,
       CAST(idx * 192 AS BIGINT) AS start_byte,
       CAST(least(idx * 192 + 256, n) AS BIGINT) AS end_byte,
       CAST(list_sum([ascii(text[i])
                      for i in generate_series(idx * 192 + 1,
                                               least(idx * 192 + 256, n))])
            AS BIGINT) AS energy_raw
FROM c
ORDER BY doc_id, chunk_idx
""",
)
def x4_audio_chunks(spark, sf_dir):
    """X4 audio chunking: overlapping 256B windows every 192B over each
    media payload (operators/multimodal.chunk_audio) — the audio framing
    twin of x4_frame_sample's fixed-arity video sampler.  Variable fan-out
    per row, all inside the Arrow batch.  The driver surface carries the
    integer per-chunk byte sum (energy_raw), which the DuckDB oracle
    replicates exactly — full value-hash coverage of the variable fan-out;
    the float energy stays on the operator for consumers.
    tests/test_curation_ops.py pins full-coverage, overlap arithmetic, and
    determinism."""
    from .operators import multimodal

    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    return (
        multimodal.chunk_audio(media)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "chunk_idx", "start_byte", "end_byte", "energy_raw")
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "j8_lateral_topk",
    oracle="""
SELECT n.n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS acctbal
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey LIMIT 3
) t
""",
)
def j8_lateral_topk(spark, sf_dir):
    """J8 correlated LATERAL join (dependent join): top-3 customers per
    nation expressed as a per-row correlated subquery with ORDER BY +
    LIMIT.  Catalyst decorrelates this into a ranked window over ONE
    customer shuffle (no per-nation re-execution) — demonstrating the SQL
    surface accepts dependent joins and plans them scalably; values pass
    through unmodified, so no canon casting beyond the explicit DOUBLE."""
    from .catalog import register_views

    register_views(spark, sf_dir, tables=("nation", "customer"))
    return spark.sql(
        """
SELECT n.n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS acctbal
FROM nation n
JOIN LATERAL (
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey LIMIT 3
) t
"""
    )


# ===========================================================================
# round-2 late additions: funnels, retention, chunking, quantized ANN,
# point-in-time interval join
# ===========================================================================


@query(
    "x5_funnel_steps",
    oracle="""
WITH t1 AS (
    SELECT user_id, MIN(ts) AS t_1 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, MIN(e.ts) AS t_2 FROM events e JOIN t1 USING (user_id)
    WHERE e.event_type = 'view' AND e.ts >= t1.t_1 GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, MIN(e.ts) AS t_3 FROM events e JOIN t2 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts >= t2.t_2 GROUP BY e.user_id
),
t4 AS (
    SELECT e.user_id, MIN(e.ts) AS t_4 FROM events e JOIN t3 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= t3.t_3 GROUP BY e.user_id
),
c AS (
    SELECT (SELECT COUNT(*) FROM t1) AS n_1,
           (SELECT COUNT(*) FROM t2) AS n_2,
           (SELECT COUNT(*) FROM t3) AS n_3,
           (SELECT COUNT(*) FROM t4) AS n_4
)
SELECT CAST(1 AS INT) AS step_idx, 'signup' AS step, n_1 AS n_users,
       round(n_1::DOUBLE / n_1::DOUBLE, 6) AS conversion FROM c
UNION ALL SELECT 2, 'view', n_2, round(n_2::DOUBLE / n_1::DOUBLE, 6) FROM c
UNION ALL SELECT 3, 'click', n_3, round(n_3::DOUBLE / n_1::DOUBLE, 6) FROM c
UNION ALL SELECT 4, 'purchase', n_4, round(n_4::DOUBLE / n_1::DOUBLE, 6) FROM c
""",
)
def x5_funnel_steps(spark, sf_dir):
    """X5 strict-order funnel (operators/funnel.funnel_steps):
    signup -> view -> click -> purchase, step i+1 counted only at-or-after
    the user's step-i completion time.  Every per-step aggregation and join
    hash-partitions on user_id (one reusable exchange); the output is 4
    rows."""
    from .operators import funnel

    return funnel.funnel_steps(
        _t(spark, sf_dir, "events"), ["signup", "view", "click", "purchase"]
    )


@query(
    "x5_retention_cohorts",
    oracle="""
WITH acts AS (
    SELECT user_id, date_trunc('week', ts) AS act_week FROM events
),
firsts AS (
    SELECT user_id, MIN(act_week) AS cohort_week FROM acts GROUP BY user_id
),
j AS (
    SELECT a.user_id, f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS INT)
               AS offset_weeks
    FROM acts a JOIN firsts f USING (user_id)
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, offset_weeks,
       COUNT(DISTINCT user_id) AS n_active_users
FROM j GROUP BY 1, 2
""",
)
def x5_retention_cohorts(spark, sf_dir):
    """X5 weekly cohort retention triangle
    (operators/funnel.retention_cohorts): cohort = ISO week of first event,
    cells count distinct active users per (cohort, offset).  Two shuffles
    (user_id, then the tiny cohort rollup)."""
    from .operators import funnel

    return funnel.retention_cohorts(_t(spark, sf_dir, "events"))


@query(
    "x3_doc_chunks",
    oracle=r"""
WITH s AS (
    SELECT doc_id, text,
           unnest(generate_series(1, greatest(length(text), 1), 150))
               AS chunk_start
    FROM documents WHERE text IS NOT NULL
),
c AS (
    SELECT doc_id,
           CAST((chunk_start - 1) // 150 AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           substring(text, CAST(chunk_start AS INT), 200) AS chunk
    FROM s
)
SELECT doc_id, chunk_idx, chunk_start,
       CAST(length(chunk) AS INT) AS chunk_len,
       CAST(len(string_split_regex(trim(chunk), '\s+')) AS INT) AS n_tokens,
       md5(chunk) AS chunk_md5
FROM c
""",
)
def x3_doc_chunks(spark, sf_dir):
    """X3 RAG-style overlapping chunking (operators/text.chunk_documents):
    200-char windows every 150 chars via sequence+posexplode — a pure
    narrow transform, zero shuffles, chunk text carried as md5."""
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=200, stride=150
    )


@query(
    "x2_quantized_topk",
    oracle="""
WITH qv AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
quant AS (
    SELECT vec_id,
           list_transform(
               v, x -> floor(x * (CASE WHEN m > 0 THEN 127.0 / m
                                       ELSE 0.0 END) + 0.5)) AS q
    FROM (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS m FROM qv) t
),
base AS (
    SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS norm FROM quant
),
scored AS (
    SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
           round(list_dot_product(a.q, b.q) / (a.norm * b.norm), 6) AS q_cosine
    FROM base a JOIN base b ON a.vec_id != b.vec_id
    WHERE a.vec_id < 20
),
ranked AS (
    SELECT q_id, cand_id, q_cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY q_cosine DESC, cand_id ASC) AS INT)
               AS rank
    FROM scored
)
SELECT q_id, cand_id, q_cosine, rank FROM ranked WHERE rank <= 5
""",
)
def x2_quantized_topk(spark, sf_dir):
    """X2 int8-quantized cosine top-k (operators/similarity.quantized_topk):
    per-vector symmetric quantization, exact small-integer dot products —
    the 4x-memory-reduction ANN variant, and the only approximate-storage
    path portable enough to carry a full DuckDB oracle."""
    return similarity.quantized_topk(
        _t(spark, sf_dir, "embeddings"), k=5, n_queries=20
    )


@query(
    "j9_point_in_time",
    oracle="""
WITH log AS (
    SELECT user_id, ts, event_type, event_id FROM events
    WHERE event_type IN ('view', 'click')
),
chg AS (
    SELECT user_id, ts, event_type, event_id,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM log
),
iv0 AS (
    SELECT user_id, event_type, ts AS valid_from, event_id
    FROM chg WHERE prev IS NULL OR event_type != prev
),
iv AS (
    SELECT user_id, event_type AS state, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
    FROM iv0
),
facts AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id,
       strftime(f.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       iv.state AS state_at_purchase,
       strftime(iv.valid_from, '%Y-%m-%d %H:%M:%S.%f') AS state_since
FROM facts f
LEFT JOIN iv ON f.user_id = iv.user_id
            AND f.ts >= iv.valid_from
            AND (iv.valid_to IS NULL OR f.ts < iv.valid_to)
""",
)
def j9_point_in_time(spark, sf_dir):
    """J9 point-in-time interval join (operators/joins.point_in_time_join
    over operators/history.scd2_intervals): each purchase picks up the
    user's browsing state (last view/click run) active at purchase time.
    One user_id shuffle shared by the SCD2 derivation and the join; SCD2
    intervals are disjoint per key so the join never amplifies."""
    from .operators import history, joins

    e = _t(spark, sf_dir, "events")
    iv = history.scd2_intervals(
        e.filter(F.col("event_type").isin("view", "click")),
        "user_id",
        "ts",
        "event_type",
        tiebreak="event_id",
    ).drop("is_current")
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = joins.point_in_time_join(
        facts, iv, on="user_id", fact_time="ts"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("event_type").alias("state_at_purchase"),
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("state_since"),
    )


@query(
    "a8_mad_anomaly",
    oracle="""
WITH med AS (
    SELECT event_type, median(value) AS m FROM events GROUP BY 1
),
d AS (
    SELECT e.event_type, e.value, med.m, abs(e.value - med.m) AS absdev
    FROM events e JOIN med USING (event_type)
),
md AS (
    SELECT event_type, median(absdev) AS md FROM d GROUP BY 1
)
SELECT d.event_type,
       round(MIN(d.m), 6) AS med,
       round(MIN(md.md), 6) AS mad,
       CAST(SUM(CASE WHEN d.absdev > 3.0 * 1.4826 * md.md THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       COUNT(*) AS n_total
FROM d JOIN md USING (event_type)
GROUP BY 1
""",
)
def a8_mad_anomaly(spark, sf_dir):
    """A8 robust median/MAD outlier summary per event type
    (operators/anomaly.mad_outlier_summary): exact interpolated medians
    (same definition as DuckDB quantile_cont), broadcast joins on the tiny
    group key, three columnar passes and no large-key shuffle."""
    from .operators import anomaly

    return anomaly.mad_outlier_summary(_t(spark, sf_dir, "events"))


_QUALITY_SCORE_SQL = r"""
    SELECT doc_id,
           round(0.4 * (len(list_filter(toks, x -> list_contains({stop}, x)))::DOUBLE
                        / len(toks)::DOUBLE)
                 + 0.3 * (1.0 - n_punct::DOUBLE / n_chars::DOUBLE)
                 + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0), 6) AS quality_score
    FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS toks,
               len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
               length(text) AS n_chars
        FROM documents
    ) t
"""


@query(
    "x3_quality_threshold_filter",
    oracle=f"""
WITH scored AS ({_QUALITY_SCORE_SQL.format(stop="{stop}")}),
thr AS (SELECT quantile_cont(quality_score, 0.25) AS thr FROM scored)
SELECT s.doc_id, s.quality_score, round(thr.thr, 6) AS threshold
FROM scored s CROSS JOIN thr
WHERE s.quality_score >= thr.thr
""".format(stop=_STOP_LIST),
)
def x3_quality_threshold_filter(spark, sf_dir):
    """X3 percentile-threshold quality filtering: drop the bottom quartile
    by exact 25th-percentile cutoff.  The scalable form — ONE scalar
    aggregate broadcast into a filter — not a global percent_rank sort
    (which would need a total order over the corpus at 100 TB)."""
    scored = text.quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "quality_score"
    )
    thr = scored.agg(
        F.percentile("quality_score", F.lit(0.25)).alias("thr")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality_score") >= F.col("thr"))
        .select(
            "doc_id", "quality_score", F.round("thr", 6).alias("threshold")
        )
    )


@query(
    "x1_chunk_dedup",
    oracle=r"""
WITH s AS (
    SELECT doc_id, text,
           unnest(generate_series(1, greatest(length(text), 1), 200))
               AS chunk_start
    FROM documents WHERE text IS NOT NULL
),
c AS (
    SELECT doc_id,
           md5(substring(text, CAST(chunk_start AS INT), 200)) AS chunk_md5
    FROM s
)
SELECT chunk_md5,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_doc
FROM c
GROUP BY chunk_md5
HAVING COUNT(*) > 1
""",
)
def x1_chunk_dedup(spark, sf_dir):
    """X1 chunk-level exact dedup: disjoint 200-char chunks grouped by md5
    — the boilerplate/header detector that document-level dedup misses.
    Composition of chunk_documents (zero-shuffle) + one 16-byte-key
    groupBy with map-side combine."""
    chunks = text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=200, stride=200
    )
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "x11_incremental_rollup",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
       round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_value,
       MIN(CAST(value AS DOUBLE)) AS min_value,
       MAX(CAST(value AS DOUBLE)) AS max_value
FROM events
GROUP BY event_type
""",
)
def x11_incremental_rollup(spark, sf_dir):
    """X11 incremental aggregation maintenance
    (operators/incremental.py): the event log is split into two "days"
    (event_id parity), each day aggregated to an algebraic partial state
    INDEPENDENTLY, and the states merged — the oracle aggregates the
    whole table directly, proving merge(state(A), state(B)) ==
    state(A ∪ B).  Decimal accumulation makes the merge order
    irrelevant; at 100 TB this is how a rollup absorbs a late batch
    without re-scanning history."""
    from .operators import incremental

    e = _t(spark, sf_dir, "events")
    day1 = incremental.partial_agg_state(
        e.filter(F.col("event_id") % 2 == 0), ["event_type"], "value"
    )
    day2 = incremental.partial_agg_state(
        e.filter(F.col("event_id") % 2 == 1), ["event_type"], "value"
    )
    return incremental.finalize_agg_state(
        incremental.merge_agg_states(day1, day2)
    )


@query(
    "a9_grouping_sets",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT)
           AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
)
def a9_grouping_sets(spark, sf_dir):
    """A9 arbitrary GROUPING SETS (beyond A5 ROLLUP / A7 CUBE): priority
    margins, status margins and the grand total in one expanded
    aggregation — one shuffle, no table re-scan per grouping.  SQL-text
    surface via the registered view."""
    from .catalog import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT)
           AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""
    )


@query(
    "a10_unpivot",
    oracle="""
WITH wide AS (
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium
    FROM orders GROUP BY o_year
)
SELECT o_year, priority, n_orders
FROM wide
UNPIVOT (n_orders FOR priority IN (urgent, high, medium))
""",
)
def a10_unpivot(spark, sf_dir):
    """A10 unpivot/melt (the inverse of A6's pivot): wide per-priority
    count columns back to long (year, priority, n) rows via the native
    ``unpivot`` — a narrow transform (no shuffle beyond the wide table's
    own aggregation)."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .count()
        .na.fill(0, ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .select(
            "o_year",
            F.col("1-URGENT").alias("urgent"),
            F.col("2-HIGH").alias("high"),
            F.col("3-MEDIUM").alias("medium"),
        )
    )
    return wide.unpivot(
        ["o_year"], ["urgent", "high", "medium"], "priority", "n_orders"
    )


@query(
    "x11_hll_incremental",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS merge_invariant,
       TRUE AS within_tolerance
FROM events GROUP BY event_type
""",
)
def x11_hll_incremental(spark, sf_dir):
    """X11 sketch-state incremental distinct counting: per-"day" HLL
    sketches of user_id per event_type, merged with hll_union_agg — the
    only way COUNT(DISTINCT) participates in incremental view
    maintenance (exact distincts don't merge).  The sketch binary itself
    is implementation-defined, so the hash-checked witness (round-5
    conversion from rows-only) asserts the two properties that ARE
    portable, per group: ``merge_invariant`` — the union of the three
    per-batch sketches estimates bit-identically to one sketch over the
    whole relation (the algebraic property incremental maintenance rests
    on) — and ``within_tolerance`` — the merged estimate lands within the
    lgK=12 error guard (rsd ~1.6%, 10% guard) of the exact distinct,
    whose value the oracle recomputes exactly.  Same pattern as
    x11_hll_accuracy/x3_profile_sketch: the sketch VALUE is
    implementation-defined, its ALGEBRA and ACCURACY are not."""
    from .operators import incremental

    e = _t(spark, sf_dir, "events")
    days = [
        incremental.hll_state(
            e.filter(F.col("event_id") % 3 == i), ["event_type"], "user_id"
        )
        for i in range(3)
    ]
    merged = incremental.finalize_hll_state(incremental.merge_hll_states(*days))
    whole = incremental.finalize_hll_state(
        incremental.hll_state(e, ["event_type"], "user_id")
    ).withColumnRenamed("approx_distinct", "whole_distinct")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        exact.join(F.broadcast(merged), "event_type")
        .join(F.broadcast(whole), "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (F.col("approx_distinct") == F.col("whole_distinct")).alias(
                "merge_invariant"
            ),
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= 0.10 * F.col("exact_distinct")
            ).alias("within_tolerance"),
        )
    )


@query(
    "x6_domain_mixture",
    oracle="""
WITH counts AS (
    SELECT lang AS dom, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
tot AS (
    SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS denom,
           SUM(n_docs) AS n_total
    FROM counts
),
rates AS (
    SELECT dom, n_docs,
           round(sqrt(CAST(n_docs AS DOUBLE)) / denom
                 * CAST(n_total AS DOUBLE) / CAST(n_docs AS DOUBLE),
                 6) AS target_rate
    FROM counts CROSS JOIN tot
)
SELECT d.doc_id,
       r.dom AS domain,
       r.target_rate,
       CAST((CAST(round(r.target_rate * 1000) AS BIGINT) // 1000)
            + CASE WHEN ((d.doc_id % 2147483647) * 2654435761) % 1000
                        < CAST(round(r.target_rate * 1000) AS BIGINT) % 1000
                   THEN 1 ELSE 0 END AS INT) AS n_repeats
FROM documents d JOIN rates r ON d.lang = r.dom
""",
)
def x6_domain_mixture(spark, sf_dir):
    """X6 temperature-scaled domain mixture (operators/sampling.
    domain_mixture): per-language sampling rates re-weighted by
    n^0.5 / sum(n^0.5) — the standard multilingual mixing scheme that
    upsamples small domains — converted to deterministic integer per-doc
    repeat counts via the id-hash per-mille bucket.  The domain-rate
    table is a tiny broadcast; no data-sized shuffle beyond the count.
    Fully oracle-checked: rates to 6 dp, repeat counts exactly."""
    from .operators import sampling

    return sampling.domain_mixture(
        _t(spark, sf_dir, "documents"), "lang", alpha=0.5
    )


@query(
    "x9_zorder_layout",
    oracle="""
WITH e AS (
    SELECT event_id,
           user_id % 1024 AS a,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) % 1024 AS b
    FROM events WHERE event_id < 20000
),
z AS (
    SELECT event_id,
           CAST(list_sum([((a >> i) & 1) * CAST(power(2, 2 * i + 1) AS BIGINT)
                          + ((b >> i) & 1) * CAST(power(2, 2 * i) AS BIGINT)
                          for i in generate_series(0, 9)]) AS BIGINT) AS zval
    FROM e
)
SELECT event_id, zval,
       CAST(zval >> 9 AS BIGINT) AS file_id
FROM z
""",
)
def x9_zorder_layout(spark, sf_dir):
    """X9 Z-order (Morton) layout assignment via the maintenance module's
    production interleave (sources/maintenance.zorder_key_expr — the same
    expression zorder_by range-partitions on): bits of the (user_id
    bucket, hour-of-epoch bucket) ranks interleaved so a rewrite
    clustered by zval gives parquet min/max skipping on BOTH columns.
    This entry value-checks the bit interleave and coarse file assignment
    exactly against DuckDB (zorder_key_expr puts column 0 on odd and
    column 1 on even bit positions); the write half (zorder_by:
    repartitionByRange + sortWithinPartitions + per-file min/max
    tightness) is asserted in tests/test_maintenance.py."""
    from .sources import maintenance

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 20000)
        .select(
            "event_id",
            (F.col("user_id") % 1024).alias("a"),
            (
                F.floor(
                    F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600
                ).cast("long")
                % 1024
            ).alias("b"),
        )
    )
    zval = maintenance.zorder_key_expr(["a", "b"], n_bits=10)
    return e.select(
        "event_id",
        zval.alias("zval"),
        F.shiftrightunsigned(zval, 9).alias("file_id"),
    )


@query(
    "x5_interval_overlap",
    oracle="""
WITH v AS (
    SELECT event_id AS view_id, ts AS vs, ts + INTERVAL '30 minutes' AS ve
    FROM events WHERE event_type = 'view' AND event_id < 1000
),
c AS (
    SELECT event_id AS click_id, ts AS cs, ts + INTERVAL '10 minutes' AS ce
    FROM events WHERE event_type = 'click' AND event_id < 1000
)
SELECT v.view_id, c.click_id,
       CAST(epoch_us(least(v.ve, c.ce)) - epoch_us(greatest(v.vs, c.cs)) AS BIGINT)
           AS overlap_us
FROM v JOIN c ON v.vs <= c.ce AND c.cs <= v.ve
""",
)
def x5_interval_overlap(spark, sf_dir):
    """X5 interval OVERLAP join (operators/joins.interval_overlap_join):
    30-minute view windows x 10-minute click windows, joined where the
    intervals intersect.  The naive non-equi form is a nested-loop
    cartesian; the operator explodes each interval into the time buckets
    it touches and equi-joins on the bucket, so only temporally-close rows
    shuffle together — the standard range-join-at-scale rewrite.  The
    DuckDB oracle uses the naive predicate (fine at sf0.01), so the
    bucketed rewrite is value-checked equivalent to the declarative
    semantics, overlap durations (microsecond-exact on both engines —
    second-granularity epoch trunc/round semantics differ) included."""
    e = _t(spark, sf_dir, "events")
    v = e.filter((F.col("event_type") == "view") & (F.col("event_id") < 1000)).select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vs"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ve"),
    )
    c = e.filter((F.col("event_type") == "click") & (F.col("event_id") < 1000)).select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cs"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ce"),
    )
    from .operators.joins import interval_overlap_join

    joined = interval_overlap_join(
        v,
        c,
        left_start="vs",
        left_end="ve",
        right_start="cs",
        right_end="ce",
        bucket_seconds=1800,
        left_keep=["view_id", "vs", "ve"],
        right_keep=["click_id", "cs", "ce"],
    )
    ep = lambda col: F.unix_micros(F.col(col).cast("timestamp"))
    return joined.select(
        "view_id",
        "click_id",
        (
            F.least(ep("ve"), ep("ce")) - F.greatest(ep("vs"), ep("cs"))
        ).alias("overlap_us"),
    )


@query(
    "x12_data_quality",
    oracle="""
WITH li AS (SELECT COUNT(*) AS n FROM lineitem),
checks AS (
    SELECT 'null_shipdate' AS check_name,
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'qty_range',
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_enum',
           CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'discount_range',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'price_under_90k',
           CAST(SUM(CASE WHEN l_extendedprice >= 90000 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
),
pk AS (
    SELECT 'pk_orderkey_linenumber' AS check_name,
           CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_violations
    FROM (
        SELECT COUNT(*) AS c FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
    )
),
fk AS (
    SELECT 'fk_lineitem_orders' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
)
SELECT c.check_name, c.n_violations, li.n AS n_checked,
       c.n_violations = 0 AS passed
FROM (SELECT * FROM checks UNION ALL SELECT * FROM pk UNION ALL SELECT * FROM fk) c
CROSS JOIN li
""",
)
def x12_data_quality(spark, sf_dir):
    """X12 data-quality expectations report (operators/quality.py): the
    lakehouse answer to the reference's DB-enforced constraints
    (ingest_ecollision_oracle_data.py:29-41) — NOT NULL, range, enum, and
    cross-column checks as conditional SUMs in ONE scan, plus PK
    uniqueness (one key groupBy) and FK orphan detection (broadcast
    left-anti join).  All counts value-checked against DuckDB."""
    from .operators import quality

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    col_checks = quality.column_expectations(
        li,
        {
            "null_shipdate": F.col("l_shipdate").isNull(),
            "qty_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "returnflag_enum": ~F.col("l_returnflag").isin("A", "N", "R"),
            "discount_range": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
            # deliberately tight expectation so the report's failing path
            # (n_violations > 0, passed=false) is exercised on clean data
            "price_under_90k": F.col("l_extendedprice") >= 90000,
        },
    )
    pk = quality.uniqueness_check(
        li, ["l_orderkey", "l_linenumber"], name="pk_orderkey_linenumber"
    )
    fk = quality.referential_check(
        li,
        od.select(F.col("o_orderkey").alias("l_orderkey")),
        ["l_orderkey"],
        name="fk_lineitem_orders",
    )
    # referential/uniqueness n_checked = lineitem count on both sides
    return col_checks.unionByName(pk).unionByName(fk)


@query(
    "x13_salted_agg",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def x13_salted_agg(spark, sf_dir):
    """X13 skew-mitigated aggregation (operators/skew.salted_groupby): the
    two-phase groupBy(keys+salt) -> groupBy(keys) rewrite that bounds any
    hot key's reducer load at corpus scale, value-checked against the
    plain single-phase aggregation semantics (algebraic aggregates
    recombine exactly — the oracle IS the unsalted query).  Decimal
    accumulation + final DOUBLE projection per the cross-engine float
    convention."""
    from .operators import skew

    li = _t(spark, sf_dir, "lineitem")
    out = skew.salted_groupby(
        li.withColumn("_q", F.col("l_quantity").cast("decimal(38,6)")),
        ["l_returnflag", "l_linestatus"],
        {
            "n_rows": ("count", "l_orderkey"),
            "sum_qty": ("sum", "_q"),
            "min_ship": ("min", "l_shipdate"),
            "max_ship": ("max", "l_shipdate"),
        },
        n_salt=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "min_ship",
        "max_ship",
    )


@query(
    "x1_dedup_longest_survivor",
    oracle=r"""
WITH fp AS (
    SELECT doc_id, n_chars,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
),
ranked AS (
    SELECT fingerprint, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY fingerprint
                              ORDER BY n_chars DESC, doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies,
           MAX(n_chars) OVER (PARTITION BY fingerprint) AS max_n_chars
    FROM fp
)
SELECT fingerprint, doc_id AS keep_id,
       CAST(n_copies AS BIGINT) AS n_copies,
       max_n_chars
FROM ranked WHERE rn = 1
""",
)
def x1_dedup_longest_survivor(spark, sf_dir):
    """X1 survivorship POLICY dedup (operators/dedup.dedup_survivors):
    exact-duplicate groups keyed by normalized-text md5 keep the LONGEST
    member (min id on ties) — the keep-the-fullest-original policy — via
    one max_by-over-struct aggregation (no window, map-side combine).
    The DuckDB oracle derives the same survivor with a rank window,
    value-checking the policy semantics."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fingerprint"),
    )
    return dedup.dedup_survivors(
        keyed, ["fingerprint"], "doc_id", prefer_col="n_chars"
    )


@query(
    "x3_inverted_index",
    oracle=r"""
WITH tok AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
posting AS (
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tok WHERE token <> '' GROUP BY token
)
SELECT token, doc_freq, postings
FROM posting
WHERE doc_freq >= 50
""",
)
def x3_inverted_index(spark, sf_dir):
    """X3 inverted-index build (token -> sorted posting list): the search
    primitive under keyword retrieval and sparse (BM25-style) hybrid
    search.  explode -> per-(doc,token) distinct -> ONE token-keyed
    aggregation; posting lists assemble with sort_array(collect_list)
    inside the aggregate (map-side partial lists merge) — no window, no
    second shuffle.  Emitted as comma-joined strings (bounded here to
    common tokens, doc_freq >= 50) and value-checked against DuckDB's
    ordered string_agg.  At corpus scale the doc_freq floor becomes a
    stopword ceiling + posting-list sharding; the plan shape is
    unchanged."""
    from .operators.text import normalize_text

    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(normalize_text("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .dropDuplicates(["doc_id", "token"])
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("doc_id"))).cast("array<string>")
            ).alias("postings"),
        )
        .filter(F.col("doc_freq") >= 50)
    )


def _countmin_oracle() -> str:
    """DuckDB replay of the full count-min pipeline, generated from the
    same hash constants as operators/sketches.py (depth=4, width=256)."""
    P = dedup._P_PORT
    W = 256
    a_case = " ".join(
        f"WHEN {r} THEN {dedup._PORT_A[r]}" for r in range(4)
    )
    b_case = " ".join(
        f"WHEN {r} THEN {dedup._PORT_B[r]}" for r in range(4)
    )
    return rf"""
WITH occ AS (
    SELECT unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
occ2 AS (SELECT token FROM occ WHERE token <> ''),
hx AS (
    SELECT token,
           CAST(list_sum([(strpos('0123456789abcdef', md5(token)[i]) - 1)
                          * CAST(power(16, 12 - i) AS BIGINT)
                          for i in generate_series(1, 12)]) % {P} AS BIGINT) AS x
    FROM occ2
),
buck AS (
    SELECT token, r,
           (((CASE r {a_case} END) * x + (CASE r {b_case} END)) % {P}) % {W}
               AS bucket
    FROM hx CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
),
sketch AS (
    SELECT r AS row, bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM buck GROUP BY r, bucket
),
true_counts AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
    FROM occ2 GROUP BY token
),
probes AS (
    SELECT token, true_count FROM true_counts
    ORDER BY true_count DESC, token ASC LIMIT 20
),
pb AS (
    SELECT p.token, p.true_count, b.r, b.bucket
    FROM probes p JOIN (SELECT DISTINCT token, r, bucket FROM buck) b
      USING (token)
)
SELECT pb.token,
       MIN(s.n) AS est_count,
       pb.true_count
FROM pb JOIN sketch s ON s.row = pb.r AND s.bucket = pb.bucket
GROUP BY pb.token, pb.true_count
"""


@query("x11_countmin_freq", oracle=_countmin_oracle())
def x11_countmin_freq(spark, sf_dir):
    """X11 count-min sketch point-frequency estimation
    (operators/sketches.py): token occurrences folded into a 4x256
    counter table (posexplode -> ONE bounded aggregation, map-side
    combine caps the shuffle at sketch size), then the 20 most frequent
    tokens estimated via min-over-rows against a broadcast of the sketch.
    Portable hash family end to end, so the DuckDB oracle replays bucket
    assignment, counters, and estimates exactly; est >= true by
    construction (asserted in tests alongside the error bound)."""
    from .operators import sketches
    from .operators.text import normalize_text

    occ = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(normalize_text("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    sketch = sketches.countmin_build(occ, depth=4, width=256)
    true_counts = occ.groupBy("token").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    probes = true_counts.orderBy(
        F.desc("true_count"), F.asc("token")
    ).limit(20)
    est = sketches.countmin_estimate(
        sketch, probes.select("token"), depth=4, width=256
    )
    return est.join(F.broadcast(probes), "token").select(
        "token", "est_count", "true_count"
    )


@query(
    "x3_bm25_topk",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
toks2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
    FROM dl
),
tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks2 WHERE token IN ('spark', 'shuffle', 'vector')
    GROUP BY doc_id, token
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY token),
scored AS (
    SELECT tf.doc_id,
           ln(1.0 + (stats.n_docs - dfreq.df_t + 0.5) / (dfreq.df_t + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS term_score
    FROM tf
    JOIN dfreq USING (token)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
)
SELECT doc_id,
       round(SUM(term_score), 6) AS bm25,
       CAST(COUNT(*) AS BIGINT) AS n_matched_terms
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 10
""",
)
def x3_bm25_topk(spark, sf_dir):
    """X3 BM25 keyword retrieval (operators/text.bm25_scores): Lucene-form
    idf + length-normalized tf, top-10 docs for a 3-term query.  Integer
    aggregates (tf, df, dl) until the final per-doc score (|query| scalar
    doubles summed, rounded 6 dp), so the ranking is engine-portable and
    the DuckDB oracle replays it exactly.  Query-term filter runs BEFORE
    the tf groupBy (full vocabulary never shuffles); df/avgdl broadcast;
    the top-k is TakeOrderedAndProject — no global sort."""
    return text.bm25_scores(
        _t(spark, sf_dir, "documents"),
        ["spark", "shuffle", "vector"],
        k=10,
    )


@query(
    "x2_hybrid_rrf",
    oracle=r"""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS norm
    FROM embeddings
),
vec AS (
    SELECT c.vec_id AS doc_id,
           round(list_dot_product(q.v, c.v) / (q.norm * c.norm), 6) AS cosine
    FROM base q JOIN base c ON q.vec_id = 0 AND c.vec_id != 0
),
vecr AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT)
               AS vec_rank
    FROM vec ORDER BY cosine DESC, doc_id ASC LIMIT 50
),
toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
toks2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
    FROM dl
),
tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks2 WHERE token IN ('spark', 'shuffle', 'vector')
    GROUP BY doc_id, token
),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY token),
kw AS (
    SELECT tf.doc_id,
           round(SUM(ln(1.0 + (stats.n_docs - dfreq.df_t + 0.5) / (dfreq.df_t + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6)
               AS bm25
    FROM tf JOIN dfreq USING (token)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
),
kwr AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
               AS kw_rank
    FROM kw ORDER BY bm25 DESC, doc_id ASC LIMIT 50
),
fused AS (
    SELECT COALESCE(v.doc_id, k.doc_id) AS doc_id,
           COALESCE(v.vec_rank, 0) AS vec_rank,
           COALESCE(k.kw_rank, 0) AS kw_rank,
           round(CASE WHEN v.vec_rank IS NULL THEN 0.0
                      ELSE 1.0 / (60 + v.vec_rank) END
                 + CASE WHEN k.kw_rank IS NULL THEN 0.0
                        ELSE 1.0 / (60 + k.kw_rank) END, 6) AS rrf
    FROM vecr v FULL OUTER JOIN kwr k ON v.doc_id = k.doc_id
)
SELECT doc_id, rrf, vec_rank, kw_rank
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 20
""",
)
def x2_hybrid_rrf(spark, sf_dir):
    """X2 hybrid retrieval via reciprocal-rank fusion: the dense side
    (exact cosine top-50 for query vector 0) and the sparse side (BM25
    top-50 for a 3-term query) full-outer-joined on doc id, fused with
    rrf = sum(1 / (60 + rank)) — the standard hybrid-search combiner.
    Absent-side ranks carry a 0 sentinel (and contribute 0), keeping the
    output NULL-free for the driver canon.  Both rank relations are
    <= 50 rows post-top-k, so their rank windows are bounded-input by
    construction; the fusion join is tiny.  Fully oracle-checked."""
    from pyspark.sql.window import Window

    vec = similarity.brute_force_topk(
        _t(spark, sf_dir, "embeddings"), k=50, n_queries=1
    ).select(F.col("cand_id").alias("doc_id"), F.col("rank").cast("long").alias("vec_rank"))
    kw = text.bm25_scores(
        _t(spark, sf_dir, "documents"), ["spark", "shuffle", "vector"], k=50
    )
    kwr = kw.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("kw_rank"),
    )
    fused = (
        vec.join(kwr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.when(F.col("vec_rank").isNull(), 0.0).otherwise(
                    1.0 / (60 + F.col("vec_rank"))
                )
                + F.when(F.col("kw_rank").isNull(), 0.0).otherwise(
                    1.0 / (60 + F.col("kw_rank"))
                ),
                6,
            ).alias("rrf"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
            F.coalesce("kw_rank", F.lit(0)).alias("kw_rank"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(20)


@query(
    "x10_snapshot_diff",
    oracle="""
WITH old AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey % 7 <> 0
),
new AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
           o_totalprice
    FROM orders WHERE o_orderkey % 3 <> 0
)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'I'
            WHEN new.o_orderkey IS NULL THEN 'D'
            WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                 OR old.o_totalprice IS DISTINCT FROM new.o_totalprice THEN 'U'
       END AS change_type
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE (old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
       OR old.o_totalprice IS DISTINCT FROM new.o_totalprice)
""",
)
def x10_snapshot_diff(spark, sf_dir):
    """X10 snapshot diff (operators/cdc.snapshot_diff): derive the change
    feed between two table versions — deterministically mutated copies of
    orders (mod-filters simulate deletes/inserts, a status rewrite
    simulates updates) — via ONE full-outer key join with null-safe
    per-column comparison.  The inverse of x10_cdc_merge's MERGE apply;
    together they round-trip snapshot-based CDC.  Fully oracle-checked."""
    from .operators import cdc

    od = _t(spark, sf_dir, "orders")
    old = od.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = od.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    return cdc.snapshot_diff(
        old, new, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )


@query(
    "x3_char_entropy",
    oracle=r"""
WITH chars AS (
    SELECT doc_id,
           unnest([text[i] for i in generate_series(1, length(text))]) AS ch
    FROM documents WHERE length(text) > 0
),
freq AS (
    SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n
    FROM chars GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_chars,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       round(ln(CAST(SUM(n) AS DOUBLE))
             - SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))
               / CAST(SUM(n) AS DOUBLE), 6) AS entropy
FROM freq
GROUP BY doc_id
""",
)
def x3_char_entropy(spark, sf_dir):
    """X3 character-entropy quality signal: Shannon entropy of the per-doc
    character distribution — low entropy flags repetitive/degenerate text,
    abnormally high flags random noise; the statistical complement of the
    n-gram repetition signals (x3_repetition_signals).

    Shuffle shape: the (doc, char) aggregation's map-side combine caps the
    shuffle at |alphabet| rows per doc per partition (~100, not text
    length); the per-doc reduction uses the algebraic identity
    H = ln(T) - (sum n*ln n)/T — plain sums, so it is a second hash
    aggregate with NO window and NO sort (the round-3 version computed T
    via a doc_id window, adding a sort pass the identity makes
    unnecessary).  The oracle mirrors the same expression, so the 6-dp
    rounding guard covers only summation-order noise."""
    chars = (
        _t(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
            ).alias("ch"),
        )
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    agg = freq.groupBy("doc_id").agg(
        F.sum("n").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum(nd * F.log(nd)).alias("_s"),
    )
    total = F.col("n_chars").cast("double")
    return agg.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        F.round(F.log(total) - F.col("_s") / total, 6).alias("entropy"),
    )


@query(
    "x8_kmeans_assign",
    oracle="""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
    SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4
),
d AS (
    SELECT e.vec_id, cent.c_id,
           list_sum([(e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i])
                     for i in generate_series(1, len(e.v))]) AS dist
    FROM e CROSS JOIN cent
),
ranked AS (
    SELECT vec_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, c_id ASC) AS rn
    FROM d
)
SELECT vec_id, CAST(c_id AS INT) AS cluster
FROM ranked WHERE rn = 1
""",
)
def x8_kmeans_assign(spark, sf_dir):
    """X8 k-means ASSIGNMENT step with pinned centroids (the first 4
    vectors — the same deterministic lowest-id seeding kmeans_fit uses):
    argmin squared-L2 via a sequential double fold per centroid, ties to
    the lowest cluster index.  Both engines fold the 64 dims left-to-right
    in double precision, so the distances are bit-identical and the
    assignment is fully oracle-checked — the exact math the iterative
    Lloyd's loop (x8_kmeans_clusters, rows-only) applies every round.
    Centroids enter the Spark plan as literal arrays (broadcast with the
    task binary); the corpus never shuffles."""
    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        [float(x) for x in r.v]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    return clustering.assign_clusters(emb, "v", seeds).select("vec_id", "cluster")


@query(
    "x2_lsh_portable",
    oracle="""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sig AS (
    SELECT vec_id,
           CAST(list_sum([CASE WHEN
                    list_sum([v[i] * (((b * 37 + (i - 1) * 101 + 13 + 42) % 7) - 3)
                              for i in generate_series(1, len(v))]) > 0
                    THEN CAST(power(2, b) AS BIGINT) ELSE 0 END
                 for b in generate_series(0, 7)]) AS BIGINT) AS bucket
    FROM e
),
n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM e),
q AS (
    SELECT e.vec_id AS q_id, e.v AS qv, n.nrm AS qnorm, s.bucket AS qsig
    FROM e JOIN n USING (vec_id) JOIN sig s USING (vec_id)
    WHERE e.vec_id < 20
),
probes AS (
    SELECT q_id, qv, qnorm, xor(qsig, m) AS bucket
    FROM q CROSS JOIN (
        SELECT CAST(unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS BIGINT) AS m)
),
c AS (
    SELECT e.vec_id AS cand_id, e.v AS cv, n.nrm AS cnorm, s.bucket
    FROM e JOIN n USING (vec_id) JOIN sig s USING (vec_id)
),
scored AS (
    SELECT DISTINCT p.q_id, c.cand_id,
           round(list_dot_product(p.qv, c.cv) / (p.qnorm * c.cnorm), 6) AS cosine
    FROM probes p JOIN c USING (bucket)
    WHERE p.q_id != c.cand_id
),
ranked AS (
    SELECT q_id, cand_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
    FROM scored
)
SELECT q_id, cand_id, cosine, rank FROM ranked WHERE rank <= 5
""",
)
def x2_lsh_portable(spark, sf_dir):
    """X2 hyperplane-LSH ANN with PORTABLE bucket assignment
    (operators/similarity.portable_hyperplane_signatures_df): integer
    plane components and sequential double folds make the projections
    bit-identical across engines, so the DuckDB oracle replays bucketing,
    single-bit multiprobe, candidate generation, and exact-cosine ranking
    end to end — the oracle-verified witness for the LSH ANN pipeline
    shape; x2_lsh_bucketed_ann keeps the xxhash64 production planes with
    a rows-only check."""
    return similarity.lsh_bucketed_ann(
        _t(spark, sf_dir, "embeddings"),
        k=5,
        n_queries=20,
        n_bits=8,
        multiprobe=1,
        signature_fn=similarity.portable_hyperplane_signatures_df,
    )


#: last invocation's cached survivors relation (see x9_curation_v2)
_CURATION_V2_CACHE: list = []


@query(
    "x9_curation_v2",
    oracle=r"""
WITH fp AS (
    SELECT doc_id, lang, n_chars,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (PARTITION BY fingerprint
                              ORDER BY n_chars DESC, doc_id ASC) AS rn
    FROM fp
),
survivors AS (SELECT doc_id, lang FROM ranked WHERE rn = 1),
counts AS (SELECT lang AS dom, COUNT(*) AS n_docs FROM survivors GROUP BY lang),
tot AS (
    SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS denom, SUM(n_docs) AS n_total
    FROM counts
),
rates AS (
    SELECT dom,
           round(sqrt(CAST(n_docs AS DOUBLE)) / denom
                 * CAST(n_total AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS target_rate
    FROM counts CROSS JOIN tot
)
SELECT s.doc_id,
       s.lang AS domain,
       CAST((CAST(round(r.target_rate * 1000) AS BIGINT) // 1000)
            + CASE WHEN ((s.doc_id % 2147483647) * 2654435761) % 1000
                        < CAST(round(r.target_rate * 1000) AS BIGINT) % 1000
                   THEN 1 ELSE 0 END AS INT) AS n_repeats,
       CASE WHEN ((s.doc_id % 2147483647) * 2654435761) % 1000 < 800 THEN 'train'
            WHEN ((s.doc_id % 2147483647) * 2654435761) % 1000 < 900 THEN 'val'
            ELSE 'test' END AS split
FROM survivors s JOIN rates r ON s.lang = r.dom
""",
)
def x9_curation_v2(spark, sf_dir):
    """X9 curation pipeline v2 — the round-3 operators composed into ONE
    chained plan: survivorship dedup (keep-longest per normalized-text
    fingerprint) -> temperature-scaled domain mixture over the SURVIVORS
    -> deterministic train/val/test split.  Shuffle budget: the dedup
    groupBy (fingerprint) + the tiny domain count; the mixture rates and
    split assignment are broadcast/narrow.  Every stage is the
    oracle-checked operator; the chained oracle re-derives the whole DAG
    in SQL CTEs, so stage INTERACTIONS (dedup feeding the mixture's
    denominators) are value-checked too, not just each stage alone."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fingerprint"),
    )
    # survivorship with the lang CARRIED through the aggregation (max_by
    # over a struct payload) — no re-join of survivors back to the corpus,
    # which would cost two extra doc_id shuffles
    survivors = (
        keyed.groupBy("fingerprint")
        .agg(
            F.max_by(
                F.struct(F.col("doc_id"), F.col("lang")),
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_tie")),
            ).alias("_kept")
        )
        .select(F.col("_kept.doc_id").alias("doc_id"), F.col("_kept.lang").alias("lang"))
    )
    # the mixture consumes survivors twice (domain counts + the final keyed
    # join) and Catalyst re-plans the subtree per consumer with divergent
    # column pruning, defeating exchange reuse — persist the (deduplicated,
    # 2-column) relation so the fingerprint shuffle runs ONCE.  Same call a
    # production pipeline makes before fanning a curated corpus into
    # multiple consumers.  The cache must outlive this function (the caller
    # materializes the returned plan), so release the PREVIOUS invocation's
    # cache instead — long-lived sessions (bench/verify warm each query
    # several times) hold at most one curation cache, not one per call.
    while _CURATION_V2_CACHE:
        _CURATION_V2_CACHE.pop().unpersist()
    survivors = survivors.persist()
    _CURATION_V2_CACHE.append(survivors)
    mixed = sampling.domain_mixture(survivors, "lang", alpha=0.5)
    split = sampling.hash_split(
        mixed.select("doc_id", "domain", "n_repeats"), "doc_id"
    )
    return split.select("doc_id", "domain", "n_repeats", "split")


@query(
    "x12_column_profile",
    oracle="""
SELECT 'o_custkey' AS column_name,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderdate',
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
""",
)
def x12_column_profile(spark, sf_dir):
    """X12 per-column data profile (null count, exact distinct count, row
    count) — the data-level twin of the reference's catalog reflection
    (helper_db_operation.py:33-39 reads column NULLability from metadata;
    this measures it).  ONE aggregation pass: count-distincts for several
    columns in a single agg (Spark plans them via a shared expand — one
    scan, not one per column), then unpivoted to (column, stats) rows.
    Exact distincts are for profile parity; at 100 TB swap in
    approx_count_distinct (the x3_profile_sketch path) per column."""
    od = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"n_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"d_{c}"))
    row = od.agg(F.count(F.lit(1)).alias("_rows"), *aggs)
    stacked = row.select(
        F.expr(
            "stack({n}, {args}) AS (column_name, n_nulls, n_distinct)".format(
                n=len(cols),
                args=", ".join(f"'{c}', n_{c}, d_{c}" for c in cols),
            )
        ),
        F.col("_rows").alias("n_rows"),
    )
    return stacked


#: temp dirs of the previous x5_stream_curation_replay invocation — freed on
#: the next call so long-lived sessions don't accumulate sink/checkpoint dirs
_STREAM_REPLAY_DIRS: list = []


@query(
    "x5_stream_curation_replay",
    oracle=rf"""
WITH t AS (
    SELECT doc_id, text, lang,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           length(text) AS n_chars
    FROM documents
),
r AS (
    SELECT text, lang,
           round(0.4 * (len(list_filter(toks, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
                        / len(toks)::DOUBLE)
                 + 0.3 * (1.0 - n_punct::DOUBLE / n_chars::DOUBLE)
                 + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0), 6) AS q
    FROM t
)
SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       lang
FROM r
WHERE q >= 0.3 AND lang = 'en'
""",
)
def x5_stream_curation_replay(spark, sf_dir):
    """X5 streaming witness that actually RUNS the writeStream path: the
    document-curation stream (streaming/docs_stream.py — quality gate ->
    language gate -> stateful fingerprint dedup) replayed over the fixture
    corpus with ``trigger(availableNow=True)`` into a checkpointed parquet
    sink, then the sink read back.  availableNow drains the source and
    stops, so the result is the stream's exact batch-equivalent output —
    the replay-parity property tests/test_streaming.py pins, here surfaced
    to the driver's DuckDB oracle.  Output is projected to the
    (fingerprint, lang) pairs, which are invariant to WHICH duplicate the
    stateful dedup keeps (doc_id would be arrival-order-dependent); lang is
    constant 'en' by the gate, fingerprints are unique by the dedup.

    Scale: the streaming state is one md5 per unique doc (see module
    docstring); the sink is append-only parquet — the same shape that runs
    continuously on a real bucket listing."""
    import shutil
    import tempfile

    from .streaming import docs_stream

    while _STREAM_REPLAY_DIRS:
        shutil.rmtree(_STREAM_REPLAY_DIRS.pop(), ignore_errors=True)
    dest = tempfile.mkdtemp(prefix="stream_replay_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_replay_ckpt_")
    srcdir = tempfile.mkdtemp(prefix="stream_replay_src_")
    _STREAM_REPLAY_DIRS.extend([dest, ckpt, srcdir])
    # the file stream source lists a DIRECTORY (arrival simulation); stage
    # the fixture file into one
    shutil.copy(f"{sf_dir}/documents.parquet", f"{srcdir}/documents.parquet")

    src = docs_stream.read_documents_stream(spark, srcdir)
    q = docs_stream.run_curation_to_parquet(src, dest, ckpt)
    q.awaitTermination()
    return spark.read.parquet(dest).select("fingerprint", "lang")


@query(
    "x2_pq_encode",
    oracle="""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
    SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4
),
sub AS (SELECT unnest(generate_series(0, 3)) AS j),
d AS (
    SELECT e.vec_id, sub.j, cent.c_id,
           list_sum([(e.v[sub.j*16 + i] - cent.cv[sub.j*16 + i])
                     * (e.v[sub.j*16 + i] - cent.cv[sub.j*16 + i])
                     for i in generate_series(1, 16)]) AS dist
    FROM e CROSS JOIN sub CROSS JOIN cent
),
ranked AS (
    SELECT vec_id, j, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j
                              ORDER BY dist ASC, c_id ASC) AS rn
    FROM d
)
SELECT vec_id, CAST(j AS INT) AS subspace, CAST(c_id AS INT) AS code
FROM ranked WHERE rn = 1
""",
)
def x2_pq_encode(spark, sf_dir):
    """X2 product-quantization encoding (operators/clustering.pq_encode):
    each 64-dim embedding split into 4x16-dim subvectors, each assigned to
    its nearest codeword — the PQ compression step of IVF-PQ ANN, which is
    how a 100-TB embedding corpus serves from memory (m codes/vector
    instead of dim floats).  Codebooks here are the pinned first-4-vector
    subvectors (the deterministic seeding x8_kmeans_assign uses; a real
    deployment trains them with kmeans_fit per subspace).  Same
    bit-identical left-to-right double fold as the k-means assignment, so
    the encoding is fully oracle-checked.  Plan: one corpus scan, codebook
    literals broadcast, a plan-level union over subspaces — zero
    shuffles."""
    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        [float(x) for x in r.v]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    codebooks = [[s[j * 16 : (j + 1) * 16] for s in seeds] for j in range(4)]
    return clustering.pq_encode(emb, "vec_id", "v", codebooks, sub_dim=16).select(
        F.col("id").alias("vec_id"), "subspace", "code"
    )


@query(
    "x3_zipf_slope",
    oracle=r"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
counts AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks WHERE token != '' GROUP BY token
),
top AS (
    SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 1000
),
ranked AS (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank FROM top
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
           AS zipf_slope
FROM ranked
""",
)
def x3_zipf_slope(spark, sf_dir):
    """X3 Zipf-slope corpus statistic: log-log regression of term frequency
    against frequency rank over the top-1000 vocabulary head — natural
    corpora fit slope ~ -1; a far-off slope flags synthetic/templated or
    boilerplate-heavy data before it poisons a training mix.  Scale shape:
    the vocabulary aggregation is the only data-sized shuffle; the head is
    a TakeOrderedAndProject (top-1000), so the ranking window runs over a
    BOUNDED 1000-row single partition (allowlisted in the plan lint) and
    regr_slope reduces it to one row."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")),
                    r"\s+",
                )
            ).alias("token")
        )
        .filter(F.col("token") != "")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(1000)
    from pyspark.sql.window import Window

    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("token"))),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.expr("regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"), 6
        ).alias("zipf_slope"),
    )


@query(
    "x12_drift_psi",
    oracle="""
WITH binned AS (
    SELECT CAST(least(floor(CAST(o_totalprice AS DOUBLE) / 50000.0), 9) AS INT)
               AS bin,
           CASE WHEN EXTRACT(YEAR FROM o_orderdate) < 1996 THEN 1 ELSE 0 END
               AS is_ref
    FROM orders
),
per_bin AS (
    SELECT bin,
           CAST(SUM(is_ref) AS BIGINT) AS n_ref,
           CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
    FROM binned GROUP BY bin
),
tot AS (
    SELECT CAST(SUM(n_ref) AS DOUBLE) AS t_ref, CAST(SUM(n_cur) AS DOUBLE) AS t_cur
    FROM per_bin
)
SELECT b.bin, b.n_ref, b.n_cur,
       round((CAST(b.n_cur + 1 AS DOUBLE) / (t.t_cur + 10)
              - CAST(b.n_ref + 1 AS DOUBLE) / (t.t_ref + 10))
             * ln((CAST(b.n_cur + 1 AS DOUBLE) / (t.t_cur + 10))
                  / (CAST(b.n_ref + 1 AS DOUBLE) / (t.t_ref + 10))), 6)
           AS psi_term
FROM per_bin b CROSS JOIN tot t
""",
)
def x12_drift_psi(spark, sf_dir):
    """X12 population-stability-index drift report: the distribution of
    order value before/after a time boundary, binned into fixed 50k-wide
    buckets, with the per-bin PSI contribution (Laplace-smoothed so empty
    bins stay finite) — the monitoring primitive that catches a training
    corpus drifting between snapshots before a model does.  Scale shape:
    ONE conditional-aggregation scan to 10 bins (map-side combine); bin
    totals come from a global window over the ALREADY-AGGREGATED 10-row
    relation (bounded by the bin count at any data size, allowlisted in
    the plan lint) — a second aggregate would re-plan the subtree and
    re-scan the fact table; total PSI is the SUM over psi_term
    downstream."""
    from pyspark.sql.window import Window

    binned = _t(spark, sf_dir, "orders").select(
        F.least(
            F.floor(F.col("o_totalprice").cast("double") / 50000.0), F.lit(9)
        )
        .cast("int")
        .alias("bin"),
        F.when(F.year("o_orderdate") < 1996, 1).otherwise(0).alias("is_ref"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("n_cur"),
    )
    w = Window.partitionBy()
    tot = per_bin.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w).cast("double").alias("t_ref"),
        F.sum("n_cur").over(w).cast("double").alias("t_cur"),
    )
    p_cur = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + 10)
    p_ref = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + 10)
    return tot.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


#: temp dirs of the previous s18_jsonl_roundtrip invocation
_JSONL_DIRS: list = []


@query(
    "s18_jsonl_roundtrip",
    oracle="""
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars FROM documents
""",
)
def s18_jsonl_roundtrip(spark, sf_dir):
    """S-surface format-fidelity witness: the documents relation written to
    JSON-lines and read back through Spark's JSON source with an explicit
    schema — unicode escaping, embedded newlines and quoting must survive
    the round trip bit-for-bit (the oracle reads the ORIGINAL parquet, so
    any mangling hash-mismatches).  JSONL is the interchange format most
    LLM-corpus tooling speaks; at scale the same two calls target an object
    store and the write is one narrow pass (no shuffle), partition-parallel
    on both sides."""
    import shutil
    import tempfile

    while _JSONL_DIRS:
        shutil.rmtree(_JSONL_DIRS.pop(), ignore_errors=True)
    out = tempfile.mkdtemp(prefix="jsonl_roundtrip_")
    _JSONL_DIRS.append(out)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    docs.write.mode("overwrite").json(out)
    schema = "doc_id long, text string, lang string"
    back = spark.read.schema(schema).json(out)
    return back.select(
        "doc_id", "lang", F.length("text").cast("long").alias("n_chars")
    )


@query(
    "x3_readability",
    oracle=r"""
WITH t AS (
    SELECT doc_id,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
           greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS n_words,
           greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS n_syllables
    FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
           AS flesch
FROM t
""",
)
def x3_readability(spark, sf_dir):
    """X3 Flesch reading-ease score from regex counts (sentences = [.!?]
    runs, words = whitespace tokens, syllables ~ vowel groups) — the
    classic readability gate a curation mix applies per audience tier;
    pure narrow projections, no shuffle at all.  All three counts floored
    at 1 so degenerate strings stay finite; identical regexes on the
    oracle side make the score fully hash-checked."""
    t = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    n_words = F.greatest(
        F.size(F.split(F.trim(F.col("text")), r"\s+")), F.lit(1)
    )
    n_syll = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
        ),
        F.lit(1),
    )
    return t.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
            - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")),
            6,
        ).alias("flesch"),
    )


@query(
    "x1_semdedup",
    oracle="""
WITH e AS (
    SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
    SELECT id AS c_id, v AS cv FROM e WHERE id < 16
),
d AS (
    SELECT e.id, cent.c_id,
           list_sum([(e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i])
                     for i in generate_series(1, len(e.v))]) AS dist
    FROM e CROSS JOIN cent
),
assign AS (
    SELECT id, CAST(c_id AS INT) AS cluster FROM (
        SELECT id, c_id,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist ASC, c_id ASC)
                   AS rn
        FROM d
    ) WHERE rn = 1
),
base AS (
    SELECT e.id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, a.cluster
    FROM e JOIN assign a USING (id)
),
dupb AS (
    SELECT DISTINCT b.id
    FROM base a JOIN base b ON a.cluster = b.cluster AND a.id < b.id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.3
)
SELECT id AS vec_id, cluster
FROM base WHERE id NOT IN (SELECT id FROM dupb)
""",
)
def x1_semdedup(spark, sf_dir):
    """X1 SemDeDup semantic deduplication (operators/dedup.semantic_dedup):
    nearest-centroid clustering bounds the pairwise-cosine join to within
    clusters, then the higher-id member of every >= threshold pair is
    discarded — the embedding-space dedup a 100-TB pretraining corpus gets
    where exact/MinHash text dedup cannot see paraphrases.  Pinned
    first-16-vector centroids (the x8 seeding, k=16: the within-cluster
    pair space is ~N^2/k, so k tracks sqrt(N) — 4 clusters cost 4x the
    pairs at this N) and the bit-identical double-fold distance/cosine
    make every stage — assignment, candidate pairs, discard set,
    survivors — DuckDB-replayable.  Fixture threshold 0.3 (production
    ~0.95: the synthetic embeddings are near-orthogonal, so 0.95 would be
    vacuous here).  Norms once per vector; one cluster-keyed shuffle +
    one anti-join."""
    from .operators import dedup as dedup_ops

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        [float(x) for x in r.v]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    return dedup_ops.semantic_dedup(
        emb, seeds, id_col="vec_id", vec_col="v", threshold=0.3
    ).select(F.col("id").alias("vec_id"), "cluster")


@query(
    "x11_hll_accuracy",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_tolerance
FROM events GROUP BY event_type
""",
)
def x11_hll_accuracy(spark, sf_dir):
    """X11 HLL accuracy audit — the oracle-checkable witness for the
    rows-only x11_hll_incremental path: the SAME per-batch sketch states,
    merged with hll_union_agg, have their estimates compared against the
    exact per-group distinct in one plan, emitting (event_type,
    exact_distinct, within_tolerance).  Exact values hash-check against
    the oracle; the booleans assert the lgK=12 sketch error (rsd ~1.6%,
    10% guard).  Same pattern as x3_profile_sketch: the sketch VALUE is
    implementation-defined, its ACCURACY is not."""
    from .operators import incremental

    e = _t(spark, sf_dir, "events")
    days = [
        incremental.hll_state(
            e.filter(F.col("event_id") % 3 == i), ["event_type"], "user_id"
        )
        for i in range(3)
    ]
    approx = incremental.finalize_hll_state(incremental.merge_hll_states(*days))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return exact.join(F.broadcast(approx), "event_type").select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= 0.10 * F.col("exact_distinct")
        ).alias("within_tolerance"),
    )


@query(
    "x6_curriculum_buckets",
    oracle=rf"""
WITH t AS (
    SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
           length(text) AS n_chars
    FROM documents
),
r AS (
    SELECT doc_id,
           round(0.4 * (len(list_filter(toks, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
                        / len(toks)::DOUBLE)
                 + 0.3 * (1.0 - n_punct::DOUBLE / n_chars::DOUBLE)
                 + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0), 6) AS q
    FROM t
),
th AS (
    SELECT round(percentile_cont(0.25) WITHIN GROUP (ORDER BY q), 6) AS t1,
           round(percentile_cont(0.50) WITHIN GROUP (ORDER BY q), 6) AS t2,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY q), 6) AS t3
    FROM r
)
SELECT doc_id, q AS quality_score,
       CAST(1 + CAST(q > t1 AS INT) + CAST(q > t2 AS INT) + CAST(q > t3 AS INT)
            AS INT) AS phase
FROM r CROSS JOIN th
""",
)
def x6_curriculum_buckets(spark, sf_dir):
    """X6 curriculum-learning phase assignment: docs bucketed into quality
    QUARTILES — phase 1 (hardest/noisiest) through 4 (cleanest) — the
    easy-to-hard data ordering curriculum training consumes.  NO global
    sort/NTILE: three exact percentile thresholds come from ONE scalar
    aggregate and broadcast into a narrow bucketing projection (the same
    shape as x3_quality_threshold_filter), so the corpus never shuffles.
    Thresholds and scores are both rounded to 6dp before comparison, so
    engine ulp differences cannot flip a boundary doc."""
    scored = _t(spark, sf_dir, "documents").select(
        "doc_id", text.quality_score_expr("text").alias("q")
    )
    th = scored.agg(
        *[
            F.round(F.expr(f"percentile(q, {p})"), 6).alias(f"t{i}")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    bucket = (
        F.lit(1)
        + (F.col("q") > F.col("t1")).cast("int")
        + (F.col("q") > F.col("t2")).cast("int")
        + (F.col("q") > F.col("t3")).cast("int")
    )
    return scored.crossJoin(F.broadcast(th)).select(
        "doc_id",
        F.col("q").alias("quality_score"),
        bucket.cast("int").alias("phase"),
    )


# ===========================================================================
# round-4 additions: Gopher quality rules, DSIR importance weights,
# PQ asymmetric-distance search, incremental SCD2 apply
# ===========================================================================


@query(
    "x3_gopher_rules",
    oracle=rf"""
WITH t AS (
    SELECT doc_id, text,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           length(regexp_replace(text, '\s', '', 'g')) AS n_nonws
    FROM documents
),
r AS (
    SELECT doc_id,
           len(toks) AS n_words,
           n_nonws::DOUBLE / len(toks)::DOUBLE AS mwl,
           len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / len(toks)::DOUBLE AS alpha_ratio,
           len(regexp_extract_all(text, '(#|\.\.\.)'))::DOUBLE
               / len(toks)::DOUBLE AS symbol_ratio,
           len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS stop_hits
    FROM t
)
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(alpha_ratio, 6) AS alpha_word_ratio,
       round(symbol_ratio, 6) AS symbol_ratio,
       CAST(stop_hits AS INT) AS stop_hits,
       (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
       (mwl >= 3.0 AND mwl <= 10.0) AS rule_mean_word_len,
       (symbol_ratio <= 0.1) AS rule_symbol_ratio,
       (alpha_ratio >= 0.8) AS rule_alpha_words,
       (stop_hits >= 2) AS rule_stopwords,
       ((n_words >= 50 AND n_words <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
        AND (symbol_ratio <= 0.1) AND (alpha_ratio >= 0.8)
        AND (stop_hits >= 2)) AS keep
FROM r
""",
)
def x3_gopher_rules(spark, sf_dir):
    """X3 Gopher quality-rule report (operators/text.gopher_rules): the
    Rae-et-al. pretraining heuristics — word-count bounds, mean word
    length, symbol ratio, alphabetic-word ratio, stopword presence — each
    emitted as a signal + boolean so a curation pipeline can re-weight
    rules without recomputing.  One narrow zero-shuffle projection; every
    signal is a codegen built-in."""
    return text.gopher_rules(_t(spark, sf_dir, "documents"))


@query(
    "x3_dsir_logweights",
    oracle=r"""
WITH toks AS (
    SELECT doc_id, lang,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS t
    FROM documents
),
bg AS (
    SELECT doc_id, (lang = 'en') AS is_tgt,
           unnest([t[i] || ' ' || t[i+1]
                   for i in generate_series(1, len(t) - 1)]) AS gram
    FROM toks
),
bk AS (
    SELECT doc_id, is_tgt,
           CAST(list_sum([(strpos('0123456789abcdef', md5(gram)[i]) - 1)
                          * CAST(power(16, 12 - i) AS BIGINT)
                          for i in generate_series(1, 12)])
                % 2147483647 AS BIGINT) % 256 AS b
    FROM bg
),
dist AS (
    SELECT b, COUNT(*) AS n_r,
           SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS n_t
    FROM bk GROUP BY b
),
tot AS (SELECT SUM(n_r) AS t_r, SUM(n_t) AS t_t FROM dist),
lut AS (
    SELECT b, ln((n_t + 1)::DOUBLE / (t_t + 256)::DOUBLE)
             - ln((n_r + 1)::DOUBLE / (t_r + 256)::DOUBLE) AS lw
    FROM dist CROSS JOIN tot
),
w AS (
    SELECT doc_id, SUM(lw) AS w
    FROM bk JOIN lut USING (b) GROUP BY doc_id
)
SELECT d.doc_id, round(coalesce(w.w, 0.0), 6) AS dsir_logweight
FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
""",
)
def x3_dsir_logweights(spark, sf_dir):
    """X3 DSIR importance weights (operators/text.dsir_logweights): per-doc
    log p_target - log p_raw under hashed-bigram bag-of-ngrams models
    (target = lang='en' docs), the score DSIR resamples to select
    pretraining data matching a target domain.  Portable md5-prefix hash
    into 256 buckets, so the DuckDB oracle replays the entire pipeline —
    feature hashing, smoothed distributions, per-doc scoring.  Bucket
    distributions come from ONE bigram pass (raw + target counted in the
    same 256-row aggregate); the log-ratio table broadcasts back into the
    bigram stream, so the only data-sized shuffle is the per-doc sum."""
    return text.dsir_logweights(
        _t(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def _pq_adc_oracle() -> str:
    """DuckDB replay of PQ encode + asymmetric-distance search — generated
    from the same subspace/codeword loops as the Spark side so the CASE
    ladders cannot drift.  The 4-term distance sum is written with explicit
    left-assoc + in BOTH engines: a fixed fold order keeps the doubles
    bit-identical, so ranking ties resolve the same way."""
    wide_cols = ",\n           ".join(
        f"MAX(CASE WHEN j = {j} THEN code END) AS c{j}" for j in range(4)
    )
    dt_cols = ",\n           ".join(
        f"MAX(CASE WHEN j = {j} AND c_id = {c} THEN d END) AS d_{j}_{c}"
        for j in range(4)
        for c in range(4)
    )
    dist_expr = " + ".join(
        "(CASE c{j} {whens} END)".format(
            j=j, whens=" ".join(f"WHEN {c} THEN d_{j}_{c}" for c in range(4))
        )
        for j in range(4)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
sub AS (SELECT unnest(generate_series(0, 3)) AS j),
dvc AS (
    SELECT e.vec_id, sub.j, cent.c_id,
           list_sum([(e.v[sub.j*16 + i] - cent.cv[sub.j*16 + i])
                     * (e.v[sub.j*16 + i] - cent.cv[sub.j*16 + i])
                     for i in generate_series(1, 16)]) AS dist
    FROM e CROSS JOIN sub CROSS JOIN cent
),
codes AS (
    SELECT vec_id, j, c_id AS code FROM (
        SELECT vec_id, j, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                  ORDER BY dist ASC, c_id ASC) AS rn
        FROM dvc) WHERE rn = 1
),
wide AS (SELECT vec_id, {wide_cols} FROM codes GROUP BY vec_id),
dt AS (
    SELECT q.q_id, sub.j, cent.c_id,
           list_sum([(q.qv[sub.j*16 + i] - cent.cv[sub.j*16 + i])
                     * (q.qv[sub.j*16 + i] - cent.cv[sub.j*16 + i])
                     for i in generate_series(1, 16)]) AS d
    FROM q CROSS JOIN sub CROSS JOIN cent
),
dtw AS (SELECT q_id, {dt_cols} FROM dt GROUP BY q_id),
scored AS (
    SELECT dtw.q_id, wide.vec_id, {dist_expr} AS adc
    FROM wide CROSS JOIN dtw
),
ranked AS (
    SELECT q_id, vec_id, adc,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY adc ASC, vec_id ASC) AS rank
    FROM scored
)
SELECT q_id, vec_id, round(adc, 6) AS adc_dist, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""


@query("x2_pq_adc_topk", oracle=_pq_adc_oracle())
def x2_pq_adc_topk(spark, sf_dir):
    """X2 PQ asymmetric-distance top-k search: the SERVING half of the PQ
    story (x2_pq_encode is the compression half).  Each query vector
    precomputes a 4x4 subspace-x-codeword distance table; every database
    vector is then scored from its 4 PQ codes by a table lookup + fixed
    left-assoc 4-term sum — the corpus's full 64-dim floats are never
    touched at query time, which is what lets a 100-TB embedding corpus
    serve ANN from RAM.  Plan: codes pivot to one row/vector (one keyed
    agg), the 10-query distance table broadcasts (bounded BNLJ), top-10
    per query via a rank window the optimizer caps with WindowGroupLimit.
    Codebooks are the pinned first-4-vector subvectors (as x2_pq_encode);
    the driver-side table build is 14 collected rows of doubles whose
    left-to-right fold matches DuckDB's list_sum bit-for-bit."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = emb.filter(F.col("vec_id") < 10).orderBy("vec_id").collect()
    seeds = [[float(x) for x in r.v] for r in rows if r.vec_id < 4]
    codebooks = [[s[j * 16 : (j + 1) * 16] for s in seeds] for j in range(4)]
    dt_rows = []
    for r in rows:
        qv = [float(x) for x in r.v]
        vals: list[float] = []
        for j in range(4):
            for c in range(4):
                d = 0.0
                for i in range(16):
                    diff = qv[j * 16 + i] - codebooks[j][c][i]
                    d += diff * diff
                vals.append(d)
        dt_rows.append((int(r.vec_id), *vals))
    schema = StructType(
        [StructField("q_id", LongType())]
        + [
            StructField(f"d_{j}_{c}", DoubleType())
            for j in range(4)
            for c in range(4)
        ]
    )
    dtable = spark.createDataFrame(dt_rows, schema)
    codes = clustering.pq_encode(emb, "vec_id", "v", codebooks, sub_dim=16)
    wide = codes.groupBy("id").agg(
        *[
            F.max(F.when(F.col("subspace") == j, F.col("code"))).alias(f"c{j}")
            for j in range(4)
        ]
    )
    dexpr = None
    for j in range(4):
        case = F.when(F.col(f"c{j}") == 0, F.col(f"d_{j}_0"))
        for c in range(1, 4):
            case = case.when(F.col(f"c{j}") == c, F.col(f"d_{j}_{c}"))
        dexpr = case if dexpr is None else dexpr + case
    scored = wide.crossJoin(F.broadcast(dtable)).select(
        "q_id", F.col("id").alias("vec_id"), dexpr.alias("adc")
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "vec_id", F.round("adc", 6).alias("adc_dist"), "rank")
    )


@query("x10_scd2_apply", oracle=_SCD2_FULL_RECOMPUTE_ORACLE)
def x10_scd2_apply(spark, sf_dir):
    """X10/X7 incremental SCD2 apply (operators/history.scd2_apply): the
    history derived from events BEFORE 2024-01-24 has the later events
    applied as an incremental batch — close the affected keys' open
    intervals, append the new ones, pass everything else through.  The
    oracle is the FULL-log recompute (same SQL as x7_scd2_status_intervals
    verbatim), so the driver hash-checks the warehouse-critical invariant:
    incremental apply == full re-derivation, row for row.  Scale shape:
    the re-derivation window runs only over batch-affected keys; untouched
    history passes through with no window and no extra shuffle."""
    from .operators import history

    e = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-24").cast("timestamp")
    base = e.filter(F.col("ts") < split)
    batch = e.filter(F.col("ts") >= split).select(
        "user_id", "ts", "event_type", "event_id"
    )
    hist = history.scd2_intervals(
        base, "user_id", "ts", "event_type", tiebreak="event_id"
    )
    applied = history.scd2_apply(
        hist, batch, "user_id", "ts", "event_type", tiebreak="event_id"
    )
    return applied.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        "is_current",
    )


@query(
    "x6_concat_chunks",
    oracle=r"""
WITH sized AS (
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
    FROM sized
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(cum // 2048 AS INT) AS seq_start,
       CAST(CASE WHEN n_tokens = 0 THEN cum // 2048
                 ELSE (cum + n_tokens - 1) // 2048 END AS INT) AS seq_end,
       CAST(cum % 2048 AS INT) AS offset_in_seq,
       CAST(CASE WHEN n_tokens = 0 THEN 0
                 ELSE (cum + n_tokens - 1) // 2048 - cum // 2048 + 1
            END AS INT) AS n_seqs
FROM c
""",
)
def x6_concat_chunks(spark, sf_dir):
    """X6 GPT-style concat-and-chunk layout map
    (operators/sampling.concat_chunks): documents laid end to end in id
    order, the token stream cut into 2048-token training sequences, each
    doc reporting the sequences it spans and its offset — the map a
    dataloader needs for packed attention-masked batches.  The global
    cumulative sum is the DISTRIBUTED two-phase prefix sum (per-bucket
    windows + a tiny broadcast bucket-offset window), never a
    single-partition window over the corpus; the oracle replays it as a
    plain global window, which DuckDB can afford at fixture scale."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(text.tokens("text")).cast("int").alias("n_tokens")
    )
    return sampling.concat_chunks(
        docs, seq_len=2048, ids_per_bucket=50
    )


def _ivf_pq_oracle() -> str:
    """DuckDB replay of the full IVF-PQ search: L2 coarse cells, 4-probe
    cell selection, PQ codes, per-query distance tables, ADC ranking —
    generated from the same loops as the Spark side.  Every distance is a
    sequential double fold (list_sum == the engine-side left-to-right
    aggregate), so cell assignment, probing order, codes, and ADC sums are
    bit-identical across engines."""
    wide_cols = ",\n           ".join(
        f"MAX(CASE WHEN j = {j} THEN code END) AS c{j}" for j in range(4)
    )
    dt_cols = ",\n           ".join(
        f"MAX(CASE WHEN j = {j} AND c_id = {c} THEN d END) AS d_{j}_{c}"
        for j in range(4)
        for c in range(4)
    )
    dist_expr = " + ".join(
        "(CASE c{j} {whens} END)".format(
            j=j, whens=" ".join(f"WHEN {c} THEN d_{j}_{c}" for c in range(4))
        )
        for j in range(4)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent16 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16),
cent4 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 4),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
celld AS (
    SELECT e.vec_id, cent16.c_id,
           list_sum([(e.v[i] - cent16.cv[i]) * (e.v[i] - cent16.cv[i])
                     for i in generate_series(1, 64)]) AS dist
    FROM e CROSS JOIN cent16
),
cells AS (
    SELECT vec_id, c_id AS cell FROM (
        SELECT vec_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, c_id ASC) AS rn
        FROM celld) WHERE rn = 1
),
probed AS (
    SELECT q.q_id, cent16.c_id,
           list_sum([(q.qv[i] - cent16.cv[i]) * (q.qv[i] - cent16.cv[i])
                     for i in generate_series(1, 64)]) AS dist
    FROM q CROSS JOIN cent16
),
probes AS (
    SELECT q_id, c_id AS cell FROM (
        SELECT q_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY dist ASC, c_id ASC) AS rn
        FROM probed) WHERE rn <= 4
),
dvc AS (
    SELECT e.vec_id, sub.j, cent4.c_id,
           list_sum([(e.v[sub.j*16 + i] - cent4.cv[sub.j*16 + i])
                     * (e.v[sub.j*16 + i] - cent4.cv[sub.j*16 + i])
                     for i in generate_series(1, 16)]) AS dist
    FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) sub
           CROSS JOIN cent4
),
codes AS (
    SELECT vec_id, j, c_id AS code FROM (
        SELECT vec_id, j, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                  ORDER BY dist ASC, c_id ASC) AS rn
        FROM dvc) WHERE rn = 1
),
wide AS (SELECT vec_id, {wide_cols} FROM codes GROUP BY vec_id),
dt AS (
    SELECT q.q_id, sub.j, cent4.c_id,
           list_sum([(q.qv[sub.j*16 + i] - cent4.cv[sub.j*16 + i])
                     * (q.qv[sub.j*16 + i] - cent4.cv[sub.j*16 + i])
                     for i in generate_series(1, 16)]) AS d
    FROM q CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) sub
           CROSS JOIN cent4
),
dtw AS (SELECT q_id, {dt_cols} FROM dt GROUP BY q_id),
cand AS (
    SELECT p.q_id, c.vec_id FROM probes p JOIN cells c ON c.cell = p.cell
),
scored AS (
    SELECT cand.q_id, cand.vec_id, {dist_expr} AS adc
    FROM cand JOIN wide ON wide.vec_id = cand.vec_id
              JOIN dtw ON dtw.q_id = cand.q_id
),
ranked AS (
    SELECT q_id, vec_id, adc,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY adc ASC, vec_id ASC) AS rank
    FROM scored
)
SELECT q_id, vec_id, round(adc, 6) AS adc_dist, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""


def _ivf_pq_search(spark, sf_dir, index_sink: str | None = None):
    """Shared IVF-PQ pipeline; with ``index_sink`` the (vec_id, cell,
    c0..c3) index relation is round-tripped through parquet before serving
    — the deployment split between index build and query time."""
    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    head = emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    cents = [[float(x) for x in r.v] for r in head]
    codebooks = [[cents[c][j * 16 : (j + 1) * 16] for c in range(4)] for j in range(4)]

    def _sqd(a, b):
        d = 0.0
        for x, y in zip(a, b):
            diff = x - y
            d += diff * diff
        return d

    probe_rows = []
    dt_rows = []
    for r in head[:10]:
        qv = [float(x) for x in r.v]
        by_cell = sorted((_sqd(qv, c), ci) for ci, c in enumerate(cents))
        probe_rows += [(int(r.vec_id), ci) for _, ci in by_cell[:4]]
        vals = [
            _sqd(qv[j * 16 : (j + 1) * 16], codebooks[j][c])
            for j in range(4)
            for c in range(4)
        ]
        dt_rows.append((int(r.vec_id), *vals))
    probes = spark.createDataFrame(
        probe_rows,
        StructType([StructField("q_id", LongType()), StructField("cell", IntegerType())]),
    )
    dtable = spark.createDataFrame(
        dt_rows,
        StructType(
            [StructField("q_id", LongType())]
            + [StructField(f"d_{j}_{c}", DoubleType()) for j in range(4) for c in range(4)]
        ),
    )
    cells = clustering.assign_clusters(emb, "v", cents).select(
        "vec_id", F.col("cluster").alias("cell")
    )
    wide = (
        clustering.pq_encode(emb, "vec_id", "v", codebooks, sub_dim=16)
        .groupBy("id")
        .agg(
            *[
                F.max(F.when(F.col("subspace") == j, F.col("code"))).alias(f"c{j}")
                for j in range(4)
            ]
        )
        .withColumnRenamed("id", "vec_id")
    )
    # the (vec_id, cell, c0..c3) relation IS the IVF-PQ index artifact —
    # 5 small ints per vector, what a real deployment writes to disk at
    # index-build time.  localCheckpoint materializes it, which also
    # truncates the argmin expression lineage: without it, Catalyst's
    # constraint propagation re-walks the 16x64-term assignment tree
    # through every downstream join and OOMs the driver.
    base = cells.join(wide, "vec_id")
    if index_sink is not None:
        # really write the artifact and serve from the files — lineage
        # truncation comes free with the round trip
        base.write.mode("overwrite").parquet(index_sink)
        base = spark.read.parquet(index_sink)
    else:
        base = base.localCheckpoint(eager=False)
    dexpr = None
    for j in range(4):
        case = F.when(F.col(f"c{j}") == 0, F.col(f"d_{j}_0"))
        for c in range(1, 4):
            case = case.when(F.col(f"c{j}") == c, F.col(f"d_{j}_{c}"))
        dexpr = case if dexpr is None else dexpr + case
    scored = (
        base.join(F.broadcast(probes), "cell")
        .join(F.broadcast(dtable), "q_id")
        .select("q_id", "vec_id", dexpr.alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "vec_id", F.round("adc", 6).alias("adc_dist"), "rank")
    )


@query("x2_ivf_pq_ann", oracle=_ivf_pq_oracle())
def x2_ivf_pq_ann(spark, sf_dir):
    """X2 IVF-PQ ANN end to end — the architecture a 100-TB embedding
    corpus actually serves with: an L2 coarse quantizer (16 Voronoi cells)
    bounds the search to 4 probed cells per query, and within candidates
    ranking is PQ asymmetric distance (per-query 4x4 lookup tables against
    4 codes/vector) — full-precision corpus floats are touched at INDEX
    time only, never at query time.

    Plan shape: the coarse cell is a ROW-LOCAL argmin projection over
    broadcast centroid literals (clustering.assign_clusters — zero
    shuffle); PQ codes come from pq_encode's plan-level union pivoted to
    one row/vector (one keyed aggregation).  Chaining all five argmins as
    row-local projections instead hung the OPTIMIZER — CollapseProject
    re-inlines each 16-fold `least` into every `when` branch of the next
    stage, exploding the expression tree — so the code pivot deliberately
    pays one co-keyed join.  The 40-row probe table and the 10-row
    distance tables join as broadcasts, and the per-query rank window
    (optimizer-capped via WindowGroupLimit) is the only other shuffle.
    The driver-side probe/table build folds doubles left-to-right,
    bit-identical to the oracle's list_sum replay."""
    return _ivf_pq_search(spark, sf_dir)


@query("x2_index_persist", oracle=_ivf_pq_oracle())
def x2_index_persist(spark, sf_dir):
    """X2 index-artifact persistence: the SAME IVF-PQ search, but the
    (vec_id, cell, codes) index relation is written to parquet and served
    from the files — the real build/serve split of a deployed ANN index
    (index built once over the corpus, queries touch only the 5-small-int
    artifact).  Identical oracle to x2_ivf_pq_ann: persistence must not
    change a single ranked result.  At scale the artifact partitions by
    cell, so probing prunes to the probed cells' files."""
    return _ivf_pq_search(spark, sf_dir, index_sink=_rt_tmpdir("ivfpq_index_", sf_dir))


@query(
    "x12_partition_completeness",
    oracle="""
WITH bounds AS (
    SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
),
spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
),
daily AS (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY CAST(ts AS DATE)
),
stats AS (
    SELECT round(AVG(n_events), 6) AS mean_n FROM daily
)
SELECT s.day, COALESCE(d.n_events, 0) AS n_events,
       CASE WHEN d.n_events IS NULL THEN 'missing'
            WHEN d.n_events < 0.5 * mean_n THEN 'short'
            ELSE 'ok' END AS status
FROM spine s LEFT JOIN daily d ON d.day = s.day CROSS JOIN stats
""",
)
def x12_partition_completeness(spark, sf_dir):
    """X12 partition-completeness report — the ops check an ingestion
    pipeline runs before trusting a day's data: the expected daily
    calendar (derived from the observed min/max, one scalar aggregate)
    LEFT-joined to per-day event counts; days absent from the data are
    'missing', days under half the mean volume are 'short'.  Scale shape:
    the fact table aggregates ONCE to |days| rows; the calendar spine
    explodes from a 1-row aggregate and every subsequent join is over
    day-count-sized relations — a 100-TB event log yields a ~365-row
    report with one data-sized shuffle."""
    e = _t(spark, sf_dir, "events").select(F.col("ts").cast("timestamp").alias("ts"))
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spine = (
        e.agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    stats = daily.agg(F.round(F.avg("n_events"), 6).alias("mean_n"))
    return (
        spine.join(daily, "day", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.when(F.col("n_events").isNull(), F.lit("missing"))
            .when(F.col("n_events") < 0.5 * F.col("mean_n"), F.lit("short"))
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
    )


@query(
    "x12_dataset_card",
    oracle=rf"""
WITH t AS (
    SELECT doc_id, lang, source, n_chars,
           regexp_split_to_array(trim(text), '\s+') AS toks, text
    FROM documents
),
per_doc AS (
    SELECT doc_id, lang, n_chars, len(toks) AS n_tokens,
           round(0.4 * (len(list_filter(toks, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
                        / len(toks)::DOUBLE)
                 + 0.3 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::DOUBLE
                                / length(text)::DOUBLE)
                 + 0.3 * least(length(text)::DOUBLE / 500.0, 1.0), 6) AS q,
           text
    FROM t
),
dups AS (
    SELECT text, COUNT(*) AS n FROM per_doc GROUP BY text
)
SELECT p.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(p.n_chars) AS BIGINT) AS total_chars,
       round(AVG(p.q), 6) AS mean_quality,
       CAST(SUM(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS docs_in_dup_groups,
       CAST(COUNT(DISTINCT p.text) AS BIGINT) AS n_unique_texts
FROM per_doc p JOIN dups d ON d.text = p.text
GROUP BY p.lang
""",
)
def x12_dataset_card(spark, sf_dir):
    """X12 dataset-card rollup — the per-language summary a curated corpus
    ships with (datasheet/dataset-card practice): doc/token/char volumes,
    mean quality score, exact-duplicate exposure, distinct-text counts.
    Scale shape: ONE narrow projection computes per-doc signals, a
    text-keyed aggregation sizes dup groups (map-side combine collapses
    duplicates pre-shuffle), and the final per-lang rollup is a keyed
    aggregation to |langs| rows — two data-sized shuffles total, both
    pre-combined.  The quality expression is the shared
    text.quality_score_expr, so the card and the curation filters cannot
    drift."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(text.tokens("text")).alias("n_tokens"),
        text.quality_score_expr("text").alias("q"),
        "text",
    )
    dups = per_doc.groupBy("text").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_doc.join(dups, "text")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("q"), 6).alias("mean_quality"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias(
                "docs_in_dup_groups"
            ),
            F.countDistinct("text").alias("n_unique_texts"),
        )
    )


@query(
    "x3_oov_rate",
    oracle=r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS token
    FROM documents
),
counts AS (
    SELECT token, COUNT(*) AS n FROM toks WHERE token != '' GROUP BY token
),
vocab AS (
    SELECT token FROM counts ORDER BY n DESC, token ASC LIMIT 100
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / COUNT(*)::DOUBLE, 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON v.token = t.token
WHERE t.token != ''
GROUP BY t.doc_id
""",
)
def x3_oov_rate(spark, sf_dir):
    """X3 out-of-vocabulary rate: per-doc fraction of tokens outside the
    top-100 corpus vocabulary — the tokenizer-fit signal that flags docs a
    fixed vocab will shred into rare pieces (cost + quality risk at
    training time).  Scale shape: the vocabulary head is a
    TakeOrderedAndProject over the token aggregation (bounded 100 rows),
    broadcast back into the token stream as a LEFT join; the only
    data-sized shuffles are the vocabulary count and the per-doc rollup,
    both map-side combined."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(dedup.normalize_text("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("oov_rate"),
        )
    )


@query(
    "x13_skew_report",
    oracle="""
WITH per_key AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_n,
           round(AVG(n), 6) AS mean_n
    FROM per_key
),
top AS (
    SELECT user_id, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS INT) AS rnk
    FROM per_key ORDER BY n DESC, user_id ASC LIMIT 5
)
SELECT t.user_id AS hot_key, t.n AS n_rows_key, t.rnk AS rank,
       s.n_keys, s.n_rows,
       round(t.n::DOUBLE / s.mean_n, 6) AS skew_factor
FROM top t CROSS JOIN stats s
""",
)
def x13_skew_report(spark, sf_dir):
    """X13 join/agg skew diagnosis — the DETECT half of the skew story
    (x13_salted_agg is the mitigation): per-key row counts aggregated
    once, the 5 heaviest keys ranked with their skew factor (key volume /
    mean key volume) plus corpus-level context.  At 100 TB this is the
    report that decides whether the flagship's collision_id shuffle needs
    salting or AQE skew splitting.  Scale shape: ONE keyed aggregation
    (map-side combined); stats reduce its output to one row; the top-5 is
    a TakeOrderedAndProject over the key counts — the rank window runs on
    a bounded 5-row relation."""
    per_key = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.round(F.avg("n"), 6).alias("mean_n"),
    )
    top = per_key.orderBy(F.desc("n"), F.asc("user_id")).limit(5)
    from pyspark.sql.window import Window

    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("user_id"))),
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        F.col("user_id").alias("hot_key"),
        F.col("n").alias("n_rows_key"),
        "rank",
        "n_keys",
        "n_rows",
        F.round(F.col("n").cast("double") / F.col("mean_n"), 6).alias("skew_factor"),
    )


# ===========================================================================
# round-4b additions: Bloom decontamination, kNN join, CSV/ORC round-trips,
# per-key deterministic sampling
# ===========================================================================


def _bloom_oracle() -> str:
    """DuckDB replay of the portable Bloom filter — generated from the same
    hash constants as operators/dedup.bloom_decontaminate_report so the two
    cannot drift."""
    m_bits = 1 << 20
    pos_list = ", ".join(
        f"(x * {dedup._PORT_A[h]} + {dedup._PORT_B[h]}) % {dedup._P_PORT} % {m_bits}"
        for h in range(3)
    )
    return rf"""
WITH toks AS (
    SELECT doc_id, source,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, source,
           unnest(CASE WHEN len(t) >= 3
                       THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                           for i in generate_series(1, len(t) - 2)])
                       ELSE list_distinct(t) END) AS shingle
    FROM toks
),
h AS (
    SELECT doc_id, source,
           CAST(list_sum([(strpos('0123456789abcdef', md5(shingle)[i]) - 1)
                          * CAST(power(16, 12 - i) AS BIGINT)
                          for i in generate_series(1, 12)])
                % {dedup._P_PORT} AS BIGINT) AS x
    FROM sh
),
filt AS (
    SELECT DISTINCT unnest([{pos_list}]) AS pos
    FROM h WHERE source = 'src0'
),
train AS (SELECT doc_id, x FROM h WHERE source != 'src0'),
probe AS (
    SELECT t.doc_id,
           CASE WHEN {" AND ".join(
               f"(t.x * {dedup._PORT_A[h]} + {dedup._PORT_B[h]}) % {dedup._P_PORT} % {m_bits} IN (SELECT pos FROM filt)"
               for h in range(3)
           )} THEN 1 ELSE 0 END AS hit
    FROM train t
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(hit) AS BIGINT) AS n_flagged_grams,
       SUM(hit) > 0 AS contaminated
FROM probe GROUP BY doc_id
"""


@query("x1_bloom_decontaminate", oracle=_bloom_oracle())
def x1_bloom_decontaminate(spark, sf_dir):
    """X1 Bloom-filter benchmark decontamination
    (operators/dedup.bloom_decontaminate_report): the benchmark partition
    (source='src0') is reduced to a <=2^20-bit Bloom filter (k=3 portable
    universal hashes over md5-prefix gram hashes) and every other
    document's word 3-grams are membership-tested against the broadcast
    filter — constant filter memory regardless of benchmark size, no
    benchmark-gram shuffle, one-sided (over-flagging) error.  The exact
    gram-join counterpart is x6_decontaminate; this is the shape that
    survives a 100-TB train corpus against a large benchmark suite."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.bloom_decontaminate_report(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=3,
        m_bits=1 << 20,
        k=3,
    )


@query(
    "x2_knn_join",
    oracle="""
WITH params AS (
    SELECT CASE WHEN COUNT(*) <= 32 THEN 4
           ELSE GREATEST(4, LEAST(24, CAST(ceil(log2(COUNT(*) / 32.0)) AS INT)))
           END AS nb
    FROM embeddings
),
e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sig AS (
    SELECT vec_id,
           CAST(list_sum([CASE WHEN
                    list_sum([v[i] * (((b * 37 + (i - 1) * 101 + 13 + 42) % 7) - 3)
                              for i in generate_series(1, len(v))]) > 0
                    THEN CAST(power(2, b) AS BIGINT) ELSE 0 END
                 for b in generate_series(0, p.nb - 1)]) AS BIGINT) AS bucket
    FROM e CROSS JOIN params p
),
n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM e),
sided AS (
    SELECT e.vec_id AS id, e.v, n.nrm, s.bucket
    FROM e JOIN n USING (vec_id) JOIN sig s USING (vec_id)
),
scored AS (
    SELECT a.id AS q_id, b.id AS cand_id,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM sided a JOIN sided b ON a.bucket = b.bucket AND a.id != b.id
),
ranked AS (
    SELECT q_id, cand_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
    FROM scored
)
SELECT q_id, cand_id, cosine, rank FROM ranked WHERE rank <= 3
""",
)
def x2_knn_join(spark, sf_dir):
    """X2 corpus-wide kNN self-join (operators/similarity.knn_join): every
    vector gets its top-3 in-bucket neighbors.  The hyperplane signature
    width is DERIVED from the corpus count (similarity.derive_n_bits:
    ceil(log2(N/32)) clamped to [4,24]) so expected bucket occupancy —
    hence candidate pairs per vector — stays ~32 at ANY corpus size:
    pair volume is linear in N, not the N²/2^fixed_bits quadratic the
    round-4 audit flagged.  One bucket-keyed shuffle plus the per-id
    WindowGroupLimit rank.  The DuckDB oracle replays the bit-width
    derivation (params CTE over COUNT(*)), buckets, cosines, and ranks
    end to end.

    The derivation needs the corpus count, which is an eager job at
    plan-construction time (the width changes the NUMBER of signature
    columns — structural, not expressible lazily).  The count is memoized
    per fixture dir, so one process that builds this plan repeatedly
    (plan lint + bench + verify) pays the column-pruned count scan once
    per fixture rather than once per construction (round-5 ADVICE);
    callers that must keep construction fully side-effect-free pass an
    explicit n_bits instead."""
    n = _KNN_CORPUS_COUNT.get(sf_dir)
    if n is None:
        n = _t(spark, sf_dir, "embeddings").select("vec_id").count()
        _KNN_CORPUS_COUNT[sf_dir] = n
    return similarity.knn_join(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        k=3,
        n_bits=similarity.derive_n_bits(n),
        seed=42,
    )


#: corpus-count memo for x2_knn_join's adaptive signature width — one
#: count job per fixture dir per process, not one per plan construction
_KNN_CORPUS_COUNT: dict = {}


#: one stable temp dir per (round-trip query prefix, fixture dir) pair
_RT_DIRS: dict = {}


def _rt_tmpdir(prefix: str, sf_dir: str) -> str:
    """Per-(query, fixture) round-trip scratch dir, removed only at
    interpreter exit.

    Results are LAZY: a caller may build several round-trip plans
    (s19/s20/s21/s22/s23/s24/x2_index_persist) before evaluating the first,
    so deleting another query's dir at build time would yank files out from
    under a not-yet-evaluated scan (the round-4 ADVICE finding).  The key
    includes ``sf_dir`` (the round-5 ADVICE finding): re-building the SAME
    query at a different scale factor gets its own dir, so the first
    build's not-yet-evaluated plan keeps its files, and s23's loose
    ``open()``-written per-doc files (which ``mode=overwrite`` does not
    govern) can never be stale leftovers from a different fixture.
    Re-building the same (query, fixture) reuses its dir — the Spark
    writes are mode=overwrite and s23 rewrites the identical file set —
    so repeated bench/test runs don't accumulate disk; the atexit hook
    cleans everything up at process exit."""
    import atexit
    import shutil
    import tempfile

    key = (prefix, sf_dir)
    if key not in _RT_DIRS:
        out = tempfile.mkdtemp(prefix=prefix)
        _RT_DIRS[key] = out
        atexit.register(shutil.rmtree, out, ignore_errors=True)
    return _RT_DIRS[key]


@query(
    "s19_csv_roundtrip",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       event_type, value, props
FROM events
""",
)
def s19_csv_roundtrip(spark, sf_dir):
    """S-surface CSV sink/source fidelity: the events relation written to
    quoted CSV and read back with an explicit schema.  ``props`` holds JSON
    text with embedded quotes and commas — the worst case for CSV framing —
    and must survive quote-escaping bit-for-bit (the oracle reads the
    ORIGINAL parquet).  Timestamps cross as pre-formatted microsecond
    strings (CSV has no timestamp type; round-tripping the FORMATTED value
    keeps the witness deterministic across writer versions).  The write is
    one narrow partition-parallel pass, no shuffle on either side."""
    out = _rt_tmpdir("csv_roundtrip_", sf_dir)
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "event_type",
        "value",
        "props",
    )
    ev.write.mode("overwrite").option("header", True).csv(out)
    schema = "event_id long, ts_str string, event_type string, value double, props string"
    return spark.read.schema(schema).option("header", True).csv(out)


@query(
    "s20_orc_roundtrip",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       user_id, event_type, value
FROM events
""",
)
def s20_orc_roundtrip(spark, sf_dir):
    """S-surface ORC sink/source fidelity: native typed round-trip through
    Spark's built-in columnar ORC source (schema embedded in the file, no
    explicit read schema needed) — timestamps keep microsecond precision
    through ORC's TIMESTAMP physical type and are formatted AFTER the
    round trip, so the witness covers the binary encoding itself.  Like
    the parquet path, ORC scans support predicate pushdown and column
    pruning at scale; the write is narrow and partition-parallel."""
    out = _rt_tmpdir("orc_roundtrip_", sf_dir)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "user_id",
        "event_type",
        "value",
    )


@query(
    "x6_per_key_sample",
    oracle=f"""
WITH ranked AS (
    SELECT event_id, user_id, event_type,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY ((event_id % {sampling._P31}) * {sampling.KNUTH}) % {sampling._P31} ASC,
                        event_id ASC) AS INT) AS sample_rank
    FROM events
)
SELECT event_id, user_id, event_type, sample_rank
FROM ranked WHERE sample_rank <= 5
""",
)
def x6_per_key_sample(spark, sf_dir):
    """X6 deterministic per-key downsample
    (operators/sampling.per_key_sample): at most 5 events per user, chosen
    by rank-over-hash — the reproducible replacement for per-key reservoir
    sampling (a true reservoir depends on row order and partitioning; this
    picks the same rows on any layout).  The canonical 'no key may exceed
    n examples' cap on a dominant user/domain/source.  One shuffle on the
    key; WindowGroupLimit keeps per-key state bounded at n."""
    from .operators import sampling as sampling_ops

    return sampling_ops.per_key_sample(
        _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type"),
        ["user_id"],
        "event_id",
        n=5,
    )


_MD5POLY = (
    "CAST(list_sum([(strpos('0123456789abcdef', md5({x})[i]) - 1)"
    " * CAST(power(16, 12 - i) AS BIGINT)"
    " for i in generate_series(1, 12)]) % 2147483647 AS BIGINT)"
)


@query(
    "x3_hashing_features",
    oracle=rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS tok
    FROM documents
),
h AS (
    SELECT doc_id, {_MD5POLY.format(x='tok')} % 64 AS feature
    FROM toks WHERE tok != ''
)
SELECT doc_id, CAST(feature AS INT) AS feature, COUNT(*) AS tf
FROM h GROUP BY doc_id, feature
""",
)
def x3_hashing_features(spark, sf_dir):
    """X3 feature hashing (operators/text.hashing_trick): tokens map to 64
    hash buckets with NO vocabulary pass — fixed feature space, no string
    dictionary broadcast, no OOV handling; the sparse bag-of-words input a
    linear probe / clustering step consumes.  Narrow projection + one
    (id, feature) aggregation with map-side combine; collisions are the
    accepted Weinberger-et-al trade."""
    return text.hashing_trick(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n_features=64
    )


@query(
    "x1_cdc_chunks",
    oracle=rf"""
WITH n AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents
),
c AS (
    SELECT doc_id, norm,
           [p for p in generate_series(2, greatest(length(norm) - 7, 1))
              if {_MD5POLY.format(x='substr(norm, CAST(p AS INT), 8)')} % 64 = 0] AS cuts
    FROM n
),
ch AS (
    SELECT doc_id, norm,
           unnest(list_concat([CAST(1 AS BIGINT)], cuts)) AS s,
           unnest(list_concat([cc - 1 for cc in cuts],
                              [CAST(length(norm) AS BIGINT)])) AS e
    FROM c
),
chunks AS (
    SELECT doc_id,
           md5(substr(norm, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS chunk_hash,
           e - s + 1 AS clen
    FROM ch
)
SELECT chunk_hash, CAST(MIN(clen) AS INT) AS chunk_len, COUNT(*) AS n_copies,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, MIN(doc_id) AS keep_id
FROM chunks GROUP BY chunk_hash
""",
)
def x1_cdc_chunks(spark, sf_dir):
    """X1 content-defined chunking dedup (operators/dedup.cdc_chunk_dedup):
    documents cut where the rolling 8-char window hash % 64 == 0 —
    boundaries are a function of LOCAL content, so an edit perturbs only
    the chunk it touches and shared regions keep producing identical
    chunks (the storage-dedup trick applied to corpus curation; fixed-
    width chunking shifts every boundary after an insertion).  Boundary
    detection + chunk extraction is ONE narrow array-expression
    projection; the only exchange is the chunk-hash aggregation."""
    return dedup.cdc_chunk_dedup(
        _t(spark, sf_dir, "documents"), "doc_id", "text", window=8, modulus=64
    )


@query(
    "x6_epoch_shuffle",
    oracle=f"""
WITH h AS (
    SELECT doc_id,
           (((doc_id + 1 * 40503) % 2147483647) * {sampling.KNUTH}) % {sampling._P31} AS hh
    FROM documents
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY hh ASC, doc_id ASC) - 1 AS BIGINT)
           AS position
FROM h
""",
)
def x6_epoch_shuffle(spark, sf_dir):
    """X6 epoch shuffle (operators/sampling.epoch_shuffle): a dense global
    permutation 0..N-1 in hash-of-(id, epoch) order — the per-epoch corpus
    shuffle of a training dataloader — WITHOUT a single-partition global
    window: rows rank within 64 contiguous hash RANGES (one 64-way
    parallel shuffle) and the 64-row range totals prefix-sum and broadcast
    back as offsets (the pack_shards two-phase trick).  Pure function of
    (id, epoch): reproducible across restarts, cluster sizes, and
    partitionings."""
    return sampling.epoch_shuffle(
        _t(spark, sf_dir, "documents").select("doc_id"), "doc_id", epoch=1
    )


#: Shared by x2_random_projection (portable HOF fold) and
#: x2_random_projection_fast (codegen multiply-add chain) — the two Spark
#: paths accumulate in the same left-to-right order, so ONE oracle replays
#: both bit-for-bit.
_JL_PROJECTION_ORACLE = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
    SELECT e.vec_id, sub.j,
           round(list_sum([e.v[i + 1]
                           * CAST((((sub.j % 2147483647) * 2654435761 + i * 40503 + 42)
                                   % 1000003) % 7 - 3 AS DOUBLE)
                           for i in generate_series(0, len(e.v) - 1)]), 6) AS y
    FROM e CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) sub
)
SELECT vec_id, CAST(j AS INT) AS dim_idx, y FROM p
"""


@query("x2_random_projection", oracle=_JL_PROJECTION_ORACLE)
def x2_random_projection(spark, sf_dir):
    """X2 Johnson-Lindenstrauss random projection
    (operators/similarity.random_projection): 64-dim embeddings reduced to
    16 components against arithmetic integer planes recomputed inline (no
    projection matrix stored or shipped) — the cheap pre-ANN
    dimensionality reduction that cuts index memory and pairwise costs
    ~4x here (~16x at production dims) while preserving pairwise
    distances to (1±eps).  Zero shuffles: a pure per-row projection,
    emitted long-form (vec_id, dim_idx, y) for the oracle hash.  JL
    distance preservation is property-tested in
    tests/test_round4b_ops.py."""
    proj = similarity.random_projection(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", out_dim=16, seed=42
    )
    return proj.select(
        "vec_id", F.posexplode("proj").alias("dim_idx", "_y")
    ).select("vec_id", "dim_idx", F.round("_y", 6).alias("y"))


@query("x2_random_projection_fast", oracle=_JL_PROJECTION_ORACLE)
def x2_random_projection_fast(spark, sf_dir):
    """X2 JL projection, codegen fast path
    (operators/similarity.random_projection_fast): posexplode +
    per-(vec_id, dim_idx) SUM — generate, project, and hash aggregate all
    inside whole-stage codegen instead of the interpreted HOF fold.
    Partial aggregation finishes each sum map-side, so the shuffle
    carries exactly the N x 16 output rows.  The aggregate updates each
    group in exploded row order (i ascending, one partial per group), the
    same left-to-right order as the portable fold — so the result is
    BIT-IDENTICAL to x2_random_projection and shares its oracle
    (hash-checked, not rows-only)."""
    proj = similarity.random_projection_fast(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        in_dim=64,
        out_dim=16,
        seed=42,
    )
    return proj.select("vec_id", "dim_idx", F.round("y", 6).alias("y"))


@query(
    "s21_jsonl_corrupt_records",
    oracle="""
WITH b AS (
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'parsed' ELSE 'corrupt' END AS bucket,
           CASE WHEN doc_id % 2 = 0 THEN length(text) ELSE 0 END AS chars
    FROM documents
)
SELECT bucket, COUNT(*) AS n_rows, CAST(SUM(chars) AS BIGINT) AS n_chars
FROM b GROUP BY bucket
""",
)
def s21_jsonl_corrupt_records(spark, sf_dir):
    """S-surface malformed-input handling: a JSONL file where every other
    line is deliberately broken, read back in PERMISSIVE mode with an
    explicit ``_corrupt_record`` column — the production posture for
    web-scraped corpora, where a bad line must become a quarantined row,
    not a failed 100-TB job.  Valid lines must parse losslessly (the
    oracle checks parsed-side char volume against the original parquet);
    corrupt lines land in the quarantine bucket with their raw text
    preserved for debugging.  DROPMALFORMED/FAILFAST are the same reader
    one option away."""
    out = _rt_tmpdir("jsonl_corrupt_", sf_dir)
    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.to_json(F.struct("doc_id", "text")),
        )
        .otherwise(
            F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "text": broken'))
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    back = (
        spark.read.schema("doc_id long, text string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # the quarantine predicate references doc_id AND _corrupt_record: a
    # projection that referenced ONLY the corrupt column would be rejected
    # by the JSON source (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN) once column pruning strips everything else — e.g. under a
    # bare .count() — and a parse that yields no id belongs in quarantine
    # anyway
    return (
        back.select(
            F.when(
                F.col("doc_id").isNotNull() & F.col("_corrupt_record").isNull(),
                F.lit("parsed"),
            )
            .otherwise(F.lit("corrupt"))
            .alias("bucket"),
            F.coalesce(F.length("text"), F.lit(0)).alias("chars"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("chars").cast("long").alias("n_chars"),
        )
    )


@query(
    "s22_schema_evolution",
    oracle="""
WITH cut AS (SELECT MAX(doc_id) // 2 AS mid FROM documents)
SELECT doc_id, lang,
       CASE WHEN doc_id <= mid THEN NULL ELSE n_chars END AS n_chars
FROM documents CROSS JOIN cut
""",
)
def s22_schema_evolution(spark, sf_dir):
    """S-surface schema evolution: two parquet batches written with
    DIFFERENT schemas (an early batch without ``n_chars``, a later batch
    with it) read back through ``mergeSchema`` into one unified relation —
    the long-lived-corpus reality where columns are added over time and
    old files must keep scanning without a rewrite.  Early-batch rows
    surface NULL for the added column (checked by the oracle); at scale
    mergeSchema costs one footer read per file and scans stay pruned and
    pushed-down per batch."""
    out = _rt_tmpdir("schema_evo_", sf_dir)
    docs = _t(spark, sf_dir, "documents")
    # split point stays a lazy 1-row broadcast (no driver collect/extra
    # job): each batch's write plan embeds the scalar agg as a
    # BroadcastNestedLoopJoin against a provably-1-row relation
    cut = F.broadcast(docs.agg(F.floor(F.max("doc_id") / 2).alias("mid")))
    split = docs.crossJoin(cut)
    split.filter(F.col("doc_id") <= F.col("mid")).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(out + "/b1")
    split.filter(F.col("doc_id") > F.col("mid")).select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").parquet(out + "/b2")
    return spark.read.option("mergeSchema", True).parquet(out + "/b1", out + "/b2")


def _curation_v3_oracle() -> str:
    """DuckDB replay of the round-4b composed pipeline — Gopher rules,
    Bloom decontamination, per-source cap, epoch shuffle — generated from
    the same constants as the operators so the stages cannot drift."""
    m_bits = 1 << 20
    pos_list = ", ".join(
        f"(x * {dedup._PORT_A[h]} + {dedup._PORT_B[h]}) % {dedup._P_PORT} % {m_bits}"
        for h in range(3)
    )
    probe_pred = " AND ".join(
        f"(t.x * {dedup._PORT_A[h]} + {dedup._PORT_B[h]}) % {dedup._P_PORT}"
        f" % {m_bits} IN (SELECT pos FROM filt)"
        for h in range(3)
    )
    return rf"""
WITH t AS (
    SELECT doc_id, source, text,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           length(regexp_replace(text, '\s', '', 'g')) AS n_nonws
    FROM documents
),
gq AS (
    SELECT doc_id,
           (len(toks) >= 50 AND len(toks) <= 100000
            AND n_nonws::DOUBLE / len(toks)::DOUBLE >= 3.0
            AND n_nonws::DOUBLE / len(toks)::DOUBLE <= 10.0
            AND len(regexp_extract_all(text, '(#|\.\.\.)'))::DOUBLE
                / len(toks)::DOUBLE <= 0.1
            AND len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                / len(toks)::DOUBLE >= 0.8
            AND len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) >= 2
           ) AS keep
    FROM t
),
ntoks AS (
    SELECT doc_id, source,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS nt
    FROM documents
),
sh AS (
    SELECT doc_id, source,
           unnest(CASE WHEN len(nt) >= 5
                       THEN list_distinct([nt[i] || ' ' || nt[i+1] || ' ' || nt[i+2]
                                           || ' ' || nt[i+3] || ' ' || nt[i+4]
                                           for i in generate_series(1, len(nt) - 4)])
                       ELSE list_distinct(nt) END) AS shingle
    FROM ntoks
),
h AS (
    SELECT doc_id, source,
           CAST(list_sum([(strpos('0123456789abcdef', md5(shingle)[i]) - 1)
                          * CAST(power(16, 12 - i) AS BIGINT)
                          for i in generate_series(1, 12)])
                % {dedup._P_PORT} AS BIGINT) AS x
    FROM sh
),
filt AS (
    SELECT DISTINCT unnest([{pos_list}]) AS pos
    FROM h WHERE source = 'src0'
),
contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM (SELECT doc_id, x FROM h WHERE source != 'src0') t
    WHERE {probe_pred}
),
kept AS (
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN gq ON gq.doc_id = d.doc_id AND gq.keep
    WHERE d.source != 'src0'
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
capped AS (
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % {sampling._P31}) * {sampling.KNUTH}) % {sampling._P31} ASC,
                            doc_id ASC) AS rn
        FROM kept) WHERE rn <= 30
)
SELECT doc_id, source,
       CAST(ROW_NUMBER() OVER (
           ORDER BY (((doc_id + 40503) % 2147483647) * {sampling.KNUTH}) % {sampling._P31} ASC,
                    doc_id ASC) - 1 AS BIGINT) AS position
FROM capped
"""


@query("x9_curation_v3", oracle=_curation_v3_oracle())
def x9_curation_v3(spark, sf_dir):
    """X9 curation pipeline v3 — the round-4b operators composed end to
    end, the shape a pretraining data refresh actually runs: Gopher
    quality rules gate documents (zero-shuffle signals), the Bloom filter
    drops benchmark-contaminated docs (broadcast probes, constant filter
    memory), a per-source cap bounds any one source's contribution
    (rank-over-hash, WindowGroupLimit), and the survivors get their epoch
    training order (hash-range permutation, no global window).  One
    composed lazy plan; the oracle replays all four stages from the same
    constants."""
    from .operators import sampling as sampling_ops

    docs = _t(spark, sf_dir, "documents")
    good = text.gopher_rules(docs).filter("keep").select("doc_id")
    train = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    clean = (
        dedup.bloom_decontaminate_report(train, bench, "doc_id", "text", n=5)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    kept = (
        train.select("doc_id", "source")
        .join(good, "doc_id", "left_semi")
        .join(clean, "doc_id", "left_semi")
    )
    capped = sampling_ops.per_key_sample(kept, ["source"], "doc_id", n=30).select(
        "doc_id", "source"
    )
    return sampling_ops.epoch_shuffle(capped, "doc_id", epoch=1)


@query(
    "s23_binaryfile_scan",
    oracle="""
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS length,
       md5(text) AS content_md5
FROM documents WHERE doc_id < 20
""",
)
def s23_binaryfile_scan(spark, sf_dir):
    """S-surface binary-file ingest: raw files read through Spark's
    ``binaryFile`` source into (path, length, content) rows — the entry
    point for image/audio corpora, where the bytes land in an opaque
    binary column and the X4 decode operators take over.  Contents are
    verified by md5 against the source-of-truth table (byte-for-byte
    fidelity through the filesystem round trip).  The 20-file fixture is
    written driver-side as test scaffolding; the OPERATOR under test is
    the distributed scan, which partitions over files at corpus scale
    (maxPartitionBytes applies; no shuffle)."""
    import os

    out = _rt_tmpdir("binfiles_", sf_dir)
    rows = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        with open(os.path.join(out, f"{int(r.doc_id):05d}.txt"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    back = spark.read.format("binaryFile").load(out)
    return back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.txt$", 1).cast("long").alias("doc_id"),
        F.col("length"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "x1_incremental_dedup",
    oracle=r"""
WITH cut AS (SELECT MAX(doc_id) // 2 AS mid FROM documents),
fp AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
),
hist AS (
    SELECT fingerprint, MIN(doc_id) AS dup_of
    FROM fp CROSS JOIN cut WHERE doc_id <= mid GROUP BY fingerprint
)
SELECT fp.doc_id, fp.fingerprint, h.dup_of,
       h.dup_of IS NULL AS is_new_unique
FROM fp CROSS JOIN cut LEFT JOIN hist h USING (fingerprint)
WHERE fp.doc_id > mid
""",
)
def x1_incremental_dedup(spark, sf_dir):
    """X1 incremental dedup — the ingest-time workflow: a NEW batch of
    documents is checked against the HISTORICAL fingerprint store (already
    materialized by earlier runs) instead of re-deduping the whole corpus.
    New docs matching a historical fingerprint report the surviving
    historical id; the rest are genuinely new.  The historical side is the
    slim (fingerprint, min_id) relation — at 100 TB that store lives as a
    bucketed table keyed on the fingerprint, so the daily batch joins
    shuffle-free on the bucket; here it is one equi-join, new-batch-sized
    output, no full-corpus rescan."""
    docs = _t(spark, sf_dir, "documents")
    # lazy 1-row broadcast split point (no driver collect/extra job),
    # the same pattern every other split in this registry uses
    cut = F.broadcast(docs.agg(F.floor(F.max("doc_id") / 2).alias("mid")))
    fp = text.fingerprint_md5(docs).crossJoin(cut)
    hist = (
        fp.filter(F.col("doc_id") <= F.col("mid"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("dup_of"))
    )
    return (
        fp.filter(F.col("doc_id") > F.col("mid"))
        .drop("mid")
        .join(hist, "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            "dup_of",
            F.col("dup_of").isNull().alias("is_new_unique"),
        )
    )


@query(
    "x3_bpe_pair_counts",
    oracle=r"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS w
    FROM documents
),
pairs AS (
    SELECT unnest([w[i:i+1] for i in generate_series(1, length(w) - 1)]) AS pair
    FROM toks WHERE length(w) >= 2
),
counted AS (
    SELECT pair, COUNT(*) AS n_pairs FROM pairs GROUP BY pair
),
ranked AS (
    SELECT pair, n_pairs,
           CAST(ROW_NUMBER() OVER (ORDER BY n_pairs DESC, pair ASC) AS INT) AS rank
    FROM counted
)
SELECT pair, n_pairs, rank FROM ranked WHERE rank <= 50
""",
)
def x3_bpe_pair_counts(spark, sf_dir):
    """X3 BPE merge statistics: corpus-wide adjacent-symbol pair counts —
    the inner loop of byte-pair-encoding tokenizer training (each round
    merges the most frequent pair; this relation IS that argmax, top-50
    for inspection).  Two explodes (words, then in-word adjacent char
    pairs) stay narrow; the only exchange is the pair-count aggregation,
    bounded by |charset|² keys with map-side combine, and the top-50 is a
    TakeOrderedAndProject.  Successive merge rounds re-run this over the
    re-segmented corpus; the per-round cost is one scan + one bounded
    shuffle at any corpus size."""
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(text.tokens(text.normalize_text("text"))).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_pairs"))
    from pyspark.sql.window import Window

    ranked = (
        counted.orderBy(F.desc("n_pairs"), F.asc("pair"))
        .limit(50)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("n_pairs"), F.asc("pair")))
            .cast("int"),
        )
    )
    return ranked


@query(
    "x4_media_resize",
    oracle=r"""
WITH p AS (
    SELECT doc_id, text, length(text) AS n,
           greatest((length(text) + 15) // 16, 1) AS h
    FROM documents
)
SELECT doc_id,
       CAST(h AS INT) AS src_h, 16 AS src_w, 8 AS out_h, 8 AS out_w,
       array_to_string(
         flatten([[CAST(CASE WHEN (r * h // 8) * 16 + (c * 2) + 1 <= n
                              THEN ascii(text[CAST((r * h // 8) * 16 + (c * 2) + 1 AS INT)])
                              ELSE 0 END AS VARCHAR)
                   for c in generate_series(0, 7)]
                  for r in generate_series(0, 7)]), ',') AS pixels_sig
FROM p
""",
)
def x4_media_resize(spark, sf_dir):
    """X4 multimodal resize plumbing (operators/multimodal.resize_images):
    the media BLOB as a 16-wide 1-channel image, nearest-neighbor
    downsampled to 8x8 inside an Arrow mapInPandas batch — the resolution-
    normalization step of a multimodal preprocessing pipeline (real codec
    path swaps in PIL.Image.resize behind the import guard; the Spark-side
    batch shape is what this verifies).  Pure integer index arithmetic, so
    the DuckDB oracle replays every sampled pixel; no shuffle — a narrow
    Arrow map over the corpus."""
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.resize_images(media, src_w=16, out_h=8, out_w=8)


@query(
    "x11_hll_intersection",
    oracle="""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
m AS (
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT COUNT(*) FROM (SELECT user_id FROM a
                                       UNION SELECT user_id FROM b)) AS BIGINT)
               AS n_union,
           CAST((SELECT COUNT(*) FROM a
                 WHERE user_id IN (SELECT user_id FROM b)) AS BIGINT)
               AS n_intersect
    )
SELECT n_a, n_b, n_union, n_intersect, TRUE AS within_tolerance FROM m
""",
)
def x11_hll_intersection(spark, sf_dir):
    """X11 sketch set algebra: |A ∩ B| for two user cohorts estimated by
    inclusion-exclusion over MERGEABLE HLL sketches (|A| + |B| − |A ∪ B|,
    where the union sketch is hll_union_agg of the per-cohort sketches —
    never a rescan of the union).  This is the audience-overlap query a
    100-TB event log answers from pre-built per-segment sketches in
    O(sketch) time; exact intersection needs a shuffle of both cohorts.
    Same accuracy-report pattern as x11_hll_accuracy: exact values are
    the oracle-checked columns, the boolean asserts the estimate within
    tolerance (inclusion-exclusion compounds the error of three
    estimates, so the guard is 3x the single-sketch rsd)."""
    from .operators import incremental

    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click")
    b = e.filter(F.col("event_type") == "view")
    sk_a = incremental.hll_state(a.withColumn("g", F.lit(1)), ["g"], "user_id")
    sk_b = incremental.hll_state(b.withColumn("g", F.lit(1)), ["g"], "user_id")
    est_a = incremental.finalize_hll_state(sk_a).select(
        F.col("approx_distinct").alias("est_a")
    )
    est_b = incremental.finalize_hll_state(sk_b).select(
        F.col("approx_distinct").alias("est_b")
    )
    est_u = incremental.finalize_hll_state(
        incremental.merge_hll_states(sk_a, sk_b)
    ).select(F.col("approx_distinct").alias("est_u"))
    n_a = a.agg(F.countDistinct("user_id").cast("long").alias("n_a"))
    n_b = b.agg(F.countDistinct("user_id").cast("long").alias("n_b"))
    n_u = (
        a.select("user_id")
        .union(b.select("user_id"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_union"))
    )
    n_i = (
        a.select("user_id")
        .distinct()
        .join(b.select("user_id").distinct(), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_intersect"))
    )
    est = (
        est_a.crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .select((F.col("est_a") + F.col("est_b") - F.col("est_u")).alias("est_i"))
    )
    return (
        n_a.crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_u))
        .crossJoin(F.broadcast(n_i))
        .crossJoin(F.broadcast(est))
        .select(
            "n_a",
            "n_b",
            "n_union",
            "n_intersect",
            (
                F.abs(F.col("est_i") - F.col("n_intersect"))
                <= F.greatest(
                    F.lit(0.06) * F.col("n_union"), F.lit(3.0)
                )
            ).alias("within_tolerance"),
        )
    )


@query(
    "x7_asof_status_rollup",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS _prev
    FROM events
),
changes AS (
    SELECT user_id, ts, event_id, event_type
    FROM ordered WHERE _prev IS NULL OR event_type <> _prev
),
iv AS (
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM changes
),
pit AS (SELECT TIMESTAMP '2024-01-15 00:00:00' AS d)
SELECT event_type AS status,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM iv CROSS JOIN pit
WHERE valid_from <= d AND (valid_to IS NULL OR valid_to > d)
GROUP BY event_type
""",
)
def x7_asof_status_rollup(spark, sf_dir):
    """X7 point-in-time rollup over the SCD2 intervals — the QUERY side of
    slowly-changing history (x7_scd2_status_intervals is the build side):
    'how many users were in each status as of time D' answered by an
    interval containment filter on the dimension, never a scan of raw
    events up to D.  This is the reference's whole point-in-time cutoff
    pattern (SURVEY §3.3) generalized to an SCD2 table: at 100 TB the
    interval table is ~|keys| rows vs the unbounded event log, and the
    as-of filter prunes to currently-valid rows before the tiny status
    rollup."""
    from .operators import history

    iv = history.scd2_intervals(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type", tiebreak="event_id"
    )
    d = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        iv.filter((F.col("valid_from") <= d) & (F.col("valid_to").isNull() | (F.col("valid_to") > d)))
        .groupBy(F.col("event_type").alias("status"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "x2_group_centroids",
    oracle="""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
tagged AS (
    SELECT CAST(vec_id % 4 AS INT) AS grp, v FROM e
),
comp AS (
    SELECT grp, CAST(i - 1 AS INT) AS pos, v[i] AS x
    FROM tagged CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
)
SELECT grp, pos, round(AVG(x), 6) AS mean_x, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM comp GROUP BY grp, pos
""",
)
def x2_group_centroids(spark, sf_dir):
    """X2 per-group embedding centroids — the mean vector per cohort
    (language, source, cluster), the primitive behind domain prototypes,
    SemDeDup seeding, and drift monitoring of embedding spaces.  Columnar
    shape: posexplode to (group, pos, x) rows, ONE (group, pos) hash
    aggregation with map-side combine — shuffle bounded by |groups| x dim
    regardless of corpus size (never collect-and-average on the driver).
    Emitted long-form; AVG is rounded to 6dp for engine-portable hashing
    (mean = sum/count is order-sensitive in the last bits; 6dp absorbs
    it)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 4).cast("int").alias("grp"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    comp = emb.select("grp", F.posexplode("v").alias("pos", "x"))
    return comp.groupBy("grp", "pos").agg(
        F.round(F.avg("x"), 6).alias("mean_x"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@query(
    "x6_negative_pairs",
    oracle=f"""
WITH d AS (SELECT doc_id FROM documents),
n AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs FROM documents)
SELECT d.doc_id AS anchor_id,
       CAST(sub.j AS INT) AS neg_idx,
       (d.doc_id + 1 + ((d.doc_id % 2147483647) * {sampling.KNUTH} + sub.j * 40503)
        % (n.n_docs - 1)) % n.n_docs AS negative_id
FROM d CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) sub
       CROSS JOIN n
""",
)
def x6_negative_pairs(spark, sf_dir):
    """X6 deterministic negative sampling for contrastive training: each
    anchor gets 4 pseudo-random negatives as a PURE PROJECTION — negative
    = (anchor + 1 + hash(anchor, j) % (N-1)) % N, which by construction
    never equals the anchor and needs NO join, NO shuffle, and no RNG
    state (same negatives on any cluster layout / re-run, the
    reproducibility a resumable training job needs).  The corpus size N
    is one scalar aggregate crossed in.  Id-space note: assumes dense ids
    (the fixture's); sparse ids compose this with a zipWithIndex-style
    dense rank first."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg((F.max("doc_id") + 1).cast("long").alias("n_docs"))
    return (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("neg_idx"),
            "n_docs",
        )
        .select(
            "anchor_id",
            F.col("neg_idx").cast("int").alias("neg_idx"),
            (
                (
                    F.col("anchor_id")
                    + 1
                    + (
                        F.pmod(F.col("anchor_id"), F.lit(sampling._P31))
                        * sampling.KNUTH
                        + F.col("neg_idx") * 40_503
                    )
                    % (F.col("n_docs") - 1)
                )
                % F.col("n_docs")
            ).alias("negative_id"),
        )
    )


@query(
    "x6_shard_manifest",
    oracle="""
WITH t AS (
    SELECT doc_id,
           CAST(greatest(len(regexp_split_to_array(trim(text), '\\s+')), 0)
                AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS cum_excl
    FROM t
),
sharded AS (
    SELECT doc_id, n_tokens, CAST(cum_excl // 2048 AS INT) AS shard_id FROM cum
)
SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM sharded GROUP BY shard_id
""",
)
def x6_shard_manifest(spark, sf_dir):
    """X6 shard manifest — the rollup a dataloader actually reads: one row
    per shard with doc count, token volume, and the id range, derived from
    the pack_shards assignment (distributed two-phase prefix sum; the
    oracle replays it with a single SQL running sum).  The manifest is
    |shards|-sized — the artifact that lets a trainer plan epochs without
    listing files; one keyed aggregation over the assignment."""
    from .operators import sampling as sampling_ops
    from .operators import text as text_ops

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.greatest(
            F.size(text_ops.tokens(F.trim(F.col("text")))), F.lit(0)
        ).cast("long").alias("n_tokens"),
    )
    sharded = sampling_ops.pack_shards(
        docs, id_col="doc_id", size_col="n_tokens", budget=2048
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "a11_winsorize",
    oracle="""
WITH b AS (
    SELECT event_type,
           percentile_cont(0.01) WITHIN GROUP (ORDER BY value) AS lo,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS hi
    FROM events GROUP BY event_type
),
c AS (
    SELECT e.event_type,
           CASE WHEN e.value < b.lo THEN b.lo
                WHEN e.value > b.hi THEN b.hi
                ELSE e.value END AS w,
           CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END AS clipped
    FROM events e JOIN b USING (event_type)
)
SELECT event_type,
       round(MIN(w), 6) AS min_w, round(MAX(w), 6) AS max_w,
       round(AVG(w), 6) AS mean_w,
       CAST(SUM(clipped) AS BIGINT) AS n_clipped
FROM c GROUP BY event_type
""",
)
def a11_winsorize(spark, sf_dir):
    """A11 per-group winsorization: clip each group's values to its own
    [p1, p99] band — the outlier treatment a quality/feature column gets
    before aggregation so one corrupt reading cannot move the mean.  Two
    passes over the grouped data: exact per-group percentiles (one keyed
    agg; Spark's `percentile` uses the same (n-1)p linear interpolation as
    percentile_cont), broadcast back as the |groups|-row clip table, then
    the clipped rollup — shuffle bounded by |groups|.  At 100 TB swap the
    exact percentile for approx_percentile and keep the identical plan."""
    e = _t(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    )
    w = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    clipped = F.when(
        (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
    ).otherwise(0)
    return (
        e.join(F.broadcast(b), "event_type")
        .select("event_type", w.alias("w"), clipped.alias("clipped"))
        .groupBy("event_type")
        .agg(
            F.round(F.min("w"), 6).alias("min_w"),
            F.round(F.max("w"), 6).alias("max_w"),
            F.round(F.avg("w"), 6).alias("mean_w"),
            F.sum("clipped").cast("long").alias("n_clipped"),
        )
    )


@query(
    "x11_running_distinct",
    oracle="""
WITH first_touch AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
news AS (
    SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new_users
    FROM first_touch GROUP BY first_day
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT d.day, COALESCE(n.n_new_users, 0) AS n_new_users,
       CAST(SUM(COALESCE(n.n_new_users, 0)) OVER (
           ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS running_distinct_users
FROM days d LEFT JOIN news n USING (day)
""",
)
def x11_running_distinct(spark, sf_dir):
    """X11 running distinct users by day — the cumulative-uniques metric,
    in its SCALABLE formulation: running COUNT(DISTINCT) is not
    incrementally computable directly (distinct doesn't sum), but each
    user contributes exactly once at their FIRST day, so
    running_distinct(d) = cumulative sum of new-user counts — one
    (user -> min day) aggregation, one per-day rollup, and a running sum
    over the |days|-row relation.  The naive form re-deduplicates an
    ever-growing prefix per day (O(days x corpus)); this is O(corpus).
    The tiny running-sum window runs on the |days|-row aggregate, never
    the data."""
    e = _t(spark, sf_dir, "events")
    first_touch = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    news = first_touch.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    days = e.select(F.to_date("ts").alias("day")).distinct()
    from pyspark.sql.window import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(news, "day", "left")
        .select("day", F.coalesce("n_new_users", F.lit(0)).alias("n_new_users"))
        .select(
            "day",
            "n_new_users",
            F.sum("n_new_users").over(w).cast("long").alias("running_distinct_users"),
        )
    )


def _mmr_oracle(n_queries: int = 10, n_candidates: int = 20, k: int = 5,
                lam: float = 0.7) -> str:
    """DuckDB replay of the greedy MMR trace, unrolled to ``k`` pick CTEs.

    Replayable because every float the argmax compares is snapped to 6dp
    on both sides: relevance = brute-force cosine (rounded 6, the
    x2_cosine_topk pattern) and the pairwise candidate sims (rounded 6 in
    the Pandas UDF — see operators/similarity.mmr_rerank).  Scores are
    then plain IEEE double ops on identical inputs, so the per-step
    (score DESC, cand_id ASC) winner matches NumPy's first-max argmax
    over ascending-id candidates.  ``1 - lam`` is embedded with full
    float repr (0.7 -> 0.30000000000000004) so both engines subtract the
    identical double."""
    om = repr(1.0 - lam)  # exact IEEE repr, e.g. 0.30000000000000004
    lam_s = repr(lam)
    parts = [f"""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS norm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           round(list_dot_product(q.v, c.v) / (q.norm * c.norm), 6) AS rel
    FROM base q JOIN base c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {n_queries}
),
cands AS (
    SELECT q_id, cand_id, rel FROM (
        SELECT q_id, cand_id, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY rel DESC, cand_id ASC) AS rnk
        FROM scored) WHERE rnk <= {n_candidates}
),
sims AS (
    SELECT c1.q_id, c1.cand_id AS a, c2.cand_id AS b,
           round(list_dot_product(ba.v, bb.v) / (ba.norm * bb.norm), 6) AS sim
    FROM cands c1
    JOIN cands c2 ON c1.q_id = c2.q_id AND c1.cand_id != c2.cand_id
    JOIN base ba ON ba.vec_id = c1.cand_id
    JOIN base bb ON bb.vec_id = c2.cand_id
)"""]
    for s in range(1, k + 1):
        if s == 1:
            score = f"CAST({lam_s} AS DOUBLE) * c.rel"
            joins = ""
            excl = ""
        else:
            prev = range(1, s)
            joins = "".join(
                f"\n    JOIN p{i} ON p{i}.q_id = c.q_id" for i in prev
            ) + "".join(
                f"\n    JOIN sims s{i} ON s{i}.q_id = c.q_id"
                f" AND s{i}.a = c.cand_id AND s{i}.b = p{i}.cand_id"
                for i in prev
            )
            pen = (f"s{s - 1}.sim" if s == 2
                   else "GREATEST(" + ", ".join(f"s{i}.sim" for i in prev) + ")")
            score = (f"CAST({lam_s} AS DOUBLE) * c.rel"
                     f" - CAST({om} AS DOUBLE) * {pen}")
            excl = ("\n    WHERE c.cand_id NOT IN ("
                    + ", ".join(f"p{i}.cand_id" for i in prev) + ")")
        parts.append(f""", p{s} AS (
    SELECT q_id, cand_id, score FROM (
        SELECT c.q_id, c.cand_id, {score} AS score,
               ROW_NUMBER() OVER (PARTITION BY c.q_id
                   ORDER BY {score} DESC, c.cand_id ASC) AS rn
        FROM cands c{joins}{excl}
    ) WHERE rn = 1
)""")
    finals = "\nUNION ALL\n".join(
        f"SELECT q_id, cand_id, CAST({s} AS INT) AS mmr_rank,"
        f" round(score, 6) AS mmr_score FROM p{s}"
        for s in range(1, k + 1)
    )
    parts.append("\n" + finals)
    return "".join(parts)


@query("x2_mmr_rerank", oracle=_mmr_oracle())
def x2_mmr_rerank(spark, sf_dir):
    """X2 MMR diversified re-ranking (operators/similarity.mmr_rerank):
    greedy relevance-vs-redundancy selection over each query's bounded
    top-20 candidates, vectorized per group in applyInPandas — the
    diversified-retrieval pass after ANN.  Every float the greedy argmax
    compares is snapped to 6dp (relevance cosines AND pairwise sims), so
    the selection trace is engine-portable and the unrolled k-step
    DuckDB oracle replays it exactly; the same trace is independently
    replayed driver-side by tests/test_round4b_ops.py."""
    return similarity.mmr_rerank(
        _t(spark, sf_dir, "embeddings"), n_queries=10, n_candidates=20, k=5
    )


@query(
    "x12_class_balance",
    oracle="""
WITH c AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type
),
tot AS (
    SELECT CAST(SUM(n) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS k FROM c
)
SELECT c.event_type, c.n,
       round(c.n / tot.total, 6) AS frac,
       round((c.n - tot.total / tot.k) * (c.n - tot.total / tot.k)
             / (tot.total / tot.k), 6) AS chi2_term,
       (c.n / tot.total) BETWEEN 0.5 / tot.k AND 2.0 / tot.k AS balanced
FROM c CROSS JOIN tot
""",
)
def x12_class_balance(spark, sf_dir):
    """X12 label/class-balance report — the pre-training sanity check that
    no class dominates or vanishes: per-class counts, fractions, the
    per-class chi-square term against the uniform expectation, and a
    balanced flag (within [0.5x, 2x] of uniform share).  One keyed
    aggregation (map-side combined) + a |classes|-row broadcast of the
    totals — the event log never moves twice.  A skewed-label corpus
    fails fast here instead of three days into a training run."""
    c = _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    exp = F.col("total") / F.col("k")
    return c.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("frac"),
        F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 6).alias("chi2_term"),
        (F.col("n") / F.col("total")).between(
            0.5 / F.col("k"), 2.0 / F.col("k")
        ).alias("balanced"),
    )


def _minhash_accuracy_oracle() -> str:
    """DuckDB replay of the MinHash accuracy audit — same constants as
    operators/dedup.minhash_estimate_report."""
    mins = ",\n           ".join(
        f"MIN(({dedup._PORT_A[i]} * x + {dedup._PORT_B[i]}) % {dedup._P_PORT}) AS m_{i}"
        for i in range(16)
    )
    bands = "\n             ".join(
        "WHEN {b} THEN array_to_string([{slots}], ',')".format(
            b=b, slots=", ".join(f"m_{b * 4 + j}" for j in range(4))
        )
        for b in range(4)
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16)
    )
    return rf"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, regexp_replace(text, '^\S+\s+', '')
    FROM documents WHERE doc_id < 20
),
toks AS (
    SELECT doc_id AS id,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS t
    FROM docs
),
sh AS (
    SELECT id,
           unnest(CASE WHEN len(t) >= 2
                       THEN list_distinct([t[i] || ' ' || t[i+1]
                                           for i in generate_series(1, len(t) - 1)])
                       ELSE list_distinct(t) END) AS shingle
    FROM toks
),
h AS (
    SELECT id, shingle,
           CAST(list_sum([(strpos('0123456789abcdef', md5(shingle)[i]) - 1)
                          * CAST(power(16, 12 - i) AS BIGINT)
                          for i in generate_series(1, 12)])
                % {dedup._P_PORT} AS BIGINT) AS x
    FROM sh
),
sig AS (
    SELECT id, COUNT(*) AS sz,
           {mins}
    FROM h GROUP BY id
),
banded AS (
    SELECT id, band_idx,
           CASE band_idx
             {bands}
           END AS band_key
    FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band_idx)
),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
),
est AS (
    SELECT c.id_a, c.id_b, sa.sz AS sz_a, sb.sz AS sz_b,
           round(({match_sum}) / 16.0, 6) AS est_jaccard
    FROM cand c JOIN sig sa ON sa.id = c.id_a JOIN sig sb ON sb.id = c.id_b
),
inter AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
    FROM cand c
    JOIN sh a ON a.id = c.id_a
    JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT e.id_a, e.id_b, e.est_jaccard,
       round(COALESCE(i.n_inter, 0)
             / CAST(e.sz_a + e.sz_b - COALESCE(i.n_inter, 0) AS DOUBLE), 6)
           AS exact_jaccard,
       abs(e.est_jaccard
           - round(COALESCE(i.n_inter, 0)
                   / CAST(e.sz_a + e.sz_b - COALESCE(i.n_inter, 0) AS DOUBLE), 6))
           <= 0.35 AS within_tolerance
FROM est e LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
"""


@query("x1_minhash_accuracy", oracle=_minhash_accuracy_oracle())
def x1_minhash_accuracy(spark, sf_dir):
    """X1 MinHash accuracy audit (operators/dedup.minhash_estimate_report):
    for every banded candidate pair, the sketch-estimated Jaccard (matching
    signature coordinates / 16 — the unbiased MinHash estimator) next to
    the exact shingle-set Jaccard with a tolerance boolean — the
    x11_hll_accuracy pattern applied to the dedup sketch, fully
    oracle-replayed because the portable hash family is integer end to
    end.  The driver hash-checks the sketch's ERROR BOUND, not just the
    pipeline shape."""
    docs = _with_synthetic_near_dups(_t(spark, sf_dir, "documents"))
    return dedup.minhash_estimate_report(
        docs, n=2, num_hashes=16, n_bands=4, tol=0.35
    )


@query(
    "s24_partition_pruned_read",
    oracle="""
SELECT event_id, user_id, event_type,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'
""",
)
def s24_partition_pruned_read(spark, sf_dir):
    """S-surface partition pruning witness: the events relation written
    PARTITIONED BY day (the layout every 100-TB event lake uses), then a
    single-day query against the files — the day predicate must resolve at
    PLANNING time to one directory (PartitionFilters in the scan, pinned
    in tests/test_plan_quality.py), so a one-day query over years of data
    lists one partition instead of scanning the lake.  The write is the
    dev-routed parquet sink with partitionBy; at scale add
    partitionOverwriteMode=dynamic for idempotent daily reloads
    (sources/writers.py:91)."""
    out = _rt_tmpdir("part_events_", sf_dir)
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    back = spark.read.parquet(out)
    # partition-type inference reads `day` back as DATE; pin the output
    # dtype to the written string so the witness is inference-independent
    return back.filter(F.col("day") == "2024-01-10").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("day").cast("string").alias("day"),
    )


@query(
    "x5_trending_topk",
    oracle="""
WITH hourly AS (
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT window_start, event_type, n_events,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY window_start
               ORDER BY n_events DESC, event_type ASC) AS INT) AS rank
    FROM hourly
)
SELECT window_start, event_type, n_events, rank FROM ranked WHERE rank <= 3
""",
)
def x5_trending_topk(spark, sf_dir):
    """X5 trending top-k: the 3 busiest event types per hour — the
    dashboard rollup behind 'what is trending now'.  One windowed keyed
    aggregation (map-side combined) + a per-window WindowGroupLimit rank
    over the already-aggregated (|windows| x |types|)-row relation — the
    rank never touches raw events.  The streaming twin is the tumbling
    aggregation (streaming/events_stream.tumbling_counts) with the rank
    applied per micro-batch in foreachBatch (streaming rank over updating
    aggregates isn't expressible in pure append mode)."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        hourly.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "x1_dup_explain",
    oracle=r"""
WITH toks AS (
    SELECT doc_id AS id,
           regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS t
    FROM documents WHERE doc_id < 200
),
sh AS (
    SELECT id,
           unnest(CASE WHEN len(t) >= 2
                       THEN list_distinct([t[i] || ' ' || t[i+1]
                                           for i in generate_series(1, len(t) - 1)])
                       ELSE list_distinct(t) END) AS shingle
    FROM toks
),
sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b, a.shingle
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
),
scored AS (
    SELECT p.id_a, p.id_b, COUNT(*) AS n_shared
    FROM pairs p GROUP BY p.id_a, p.id_b
),
strong AS (
    SELECT s.id_a, s.id_b, s.n_shared
    FROM scored s
    JOIN sizes za ON za.id = s.id_a JOIN sizes zb ON zb.id = s.id_b
    WHERE round(s.n_shared / CAST(za.sz + zb.sz - s.n_shared AS DOUBLE), 6) >= 0.05
),
expl AS (
    SELECT p.id_a, p.id_b, p.shingle,
           CAST(ROW_NUMBER() OVER (PARTITION BY p.id_a, p.id_b
                                   ORDER BY p.shingle ASC) AS INT) AS shingle_rank
    FROM pairs p JOIN strong USING (id_a, id_b)
)
SELECT e.id_a, e.id_b, s.n_shared, e.shingle, e.shingle_rank
FROM expl e JOIN strong s USING (id_a, id_b)
WHERE e.shingle_rank <= 3
""",
)
def x1_dup_explain(spark, sf_dir):
    """X1 near-dup EXPLANATION rows: for every candidate pair above the
    Jaccard floor, the first 3 shared shingles — the human-auditable
    evidence a dedup reviewer (or an appeals process) needs beyond a bare
    similarity score.  The shared-shingle relation is the same
    shingle-keyed equi-join the verification step already pays; the
    explanation is a per-pair WindowGroupLimit over rows that exist
    anyway.  Bounded to the oracle id range (<200) like the other exact
    all-pairs ground truths."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = dedup.shingle_rows(docs, "doc_id", "text", n=2)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sh_a = sh.select(F.col("id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("id").alias("id_b"), "shingle")
    pairs = sh_a.join(sh_b, "shingle").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared"))
    za = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    strong = (
        scored.join(za, "id_a")
        .join(zb, "id_b")
        .filter(
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")).cast("double"),
                6,
            )
            >= 0.05
        )
        .select("id_a", "id_b", "n_shared")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a", "id_b").orderBy(F.asc("shingle"))
    expl = (
        pairs.join(strong.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
        .withColumn("shingle_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("shingle_rank") <= 3)
    )
    return expl.join(strong, ["id_a", "id_b"]).select(
        "id_a", "id_b", "n_shared", "shingle", "shingle_rank"
    )


def _kmeans_elbow_oracle() -> str:
    """DuckDB replay of the elbow report: nearest-centroid assignment and
    summed squared distances for k in {2, 4, 8, 16}, seeds = first-k
    vectors (the x8 seeding)."""
    parts = []
    for k in (2, 4, 8, 16):
        parts.append(f"""
SELECT {k} AS k,
       round(SUM(best), 6) AS inertia,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM (
    SELECT e.vec_id,
           MIN(list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                         for i in generate_series(1, len(e.v))])) AS best
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
    CROSS JOIN (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id < {k}) c
    GROUP BY e.vec_id
)""")
    return "\nUNION ALL\n".join(parts)


@query("x8_kmeans_elbow", oracle=_kmeans_elbow_oracle())
def x8_kmeans_elbow(spark, sf_dir):
    """X8 k-means elbow report: total inertia (sum of squared distance to
    the nearest seed centroid) for k in {2, 4, 8, 16} — the model-
    selection curve that picks k before committing to the full Lloyd's
    loop.  Each k is one broadcast-literal assignment pass (row-local
    argmin, zero shuffle) + a 1-row SUM; four passes union plan-level.
    MIN-of-distances equals the assigned cluster's distance, so the
    DuckDB replay is bit-identical (sequential double folds both
    sides)."""
    from .operators import clustering

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds16 = [
        [float(x) for x in r.v]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    parts = []
    for k in (2, 4, 8, 16):
        cents = seeds16[:k]
        dists = [
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in cents
        ]
        best = F.least(*dists) if len(dists) > 1 else dists[0]
        parts.append(
            emb.select(best.alias("best")).agg(
                F.lit(k).alias("k"),
                F.round(F.sum("best"), 6).alias("inertia"),
                F.count(F.lit(1)).alias("n_vecs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "j10_abandoned_views",
    oracle="""
SELECT v.event_id AS view_id, v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
FROM events v
WHERE v.event_type = 'view'
  AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = v.user_id
        AND c.event_type = 'click'
        AND c.ts >= v.ts
        AND c.ts <= v.ts + INTERVAL '30 minutes'
  )
""",
)
def j10_abandoned_views(spark, sf_dir):
    """J10 temporal ANTI-join: views never followed by a same-user click
    within 30 minutes — the abandonment/non-conversion complement of the
    x5 attribution interval join.  Expressed as a LEFT ANTI join with the
    (user equi + time range) condition: the equi part keys ONE user_id
    shuffle shared by both sides and the range predicate evaluates
    post-match, so the anti join costs exactly what the inner interval
    join costs — no second pass, no NOT IN re-scan.  The streaming analog
    is the watermark-closed 'no click arrived' timeout of a stateful
    operator."""
    e = _t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return v.join(c, cond, "left_anti").select(
        "view_id",
        "user_id",
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
    )

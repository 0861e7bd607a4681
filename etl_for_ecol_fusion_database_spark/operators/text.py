"""X3 text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  Each operator is exercised on the
``documents`` fixture table and, where SQL-expressible, checked against the
DuckDB oracle (registry_ext.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: regex for whitespace tokenization (kept RE2/Java-regex compatible so the
#: DuckDB oracle uses the identical pattern)
WS = r"\s+"

#: BPE-ish pre-tokenizer: letter runs, single digits, single punctuation —
#: the shape GPT-style byte-pair pre-tokenization produces for ASCII text.
BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

#: tiny per-language marker vocabularies for the n-gram/stopword language-ID
#: heuristic; deliberately small and closed so the oracle SQL can embed them.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "des", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-ish placeholders
}

#: stopwords for the quality-score ratio (English core; closed set)
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "on", "for",
)


def tokens(col: Column | str, pattern: str = WS) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), pattern)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish pre-tokens (SURVEY.md
    §2.11 X3).  Both counts pinned to INT."""
    return df.select(
        "doc_id",
        F.size(tokens(text_col)).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)).cast("int").alias(
            "n_bpe_tokens"
        ),
    )


def quality_score_expr(text_col: str = "text") -> Column:
    """The quality score as a single reusable column expression — lets
    streaming pipelines add it with ``withColumn`` (no self-join, which a
    stream cannot do)."""
    t = tokens(text_col)
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_chars = F.length(text_col)
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    len_norm = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * len_norm,
        6,
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring from length / punctuation / stopword ratios.

    score = 0.4*stopword_ratio + 0.3*(1 - punct_ratio) + 0.3*len_norm,
    all ratios double, rounded to 6dp for cross-engine hash stability.
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_chars = F.length(text_col)
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    len_norm = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    return df.select(
        "doc_id",
        F.col(text_col).alias("_text"),
        n_tok.cast("int").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.lit(0.4) * stop_ratio + F.lit(0.3) * (F.lit(1.0) - punct_ratio) + F.lit(0.3) * len_norm,
            6,
        ).alias("quality_score"),
    ).drop("_text")


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-hit counts over lowercased whitespace tokens."""
    t = tokens(F.lower(F.col(text_col)))

    def hit_counter(markers):
        # closure factory: a default arg would change the lambda's arity and
        # make F.filter pass the element *index* into it
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(t, hit_counter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: argmax of marker-vocabulary hits with a fixed
    evaluation order as tiebreak (en > es > de > fr > zh), 'und' when no
    marker hits at all."""
    scores = lang_scores(text_col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    cols = [F.col("doc_id")]
    cols += [scores[lang].cast("int").alias(f"score_{lang}") for lang in langs]
    cols.append(pred.alias("pred_lang"))
    return df.select(*cols)


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Vocabulary building: token frequency over the normalized corpus,
    top-k by (count DESC, token ASC) for determinism.  explode + one
    hash-partitioned count (map-side combine collapses each partition's
    token multiset before the shuffle) + TakeOrderedAndProject for the
    top-k — no global sort."""
    toks = F.explode(F.split(normalize_text(text_col), WS)).alias("token")
    return (
        df.select(toks)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def length_histogram(df: DataFrame, text_col: str = "text", bucket_width: int = 100) -> DataFrame:
    """Document-length histogram: fixed-width char buckets with counts and
    exact bucket bounds — the distribution profile a curation pipeline
    checks before/after filtering."""
    bucket = F.floor(F.length(text_col) / bucket_width).cast("long")
    return (
        df.select(bucket.alias("bucket"), F.length(text_col).alias("n_chars"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def training_data_prep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Composed training-data prep pipeline: quality filter + language
    filter + exact dedup in ONE pass — the end-to-end curation shape
    (C4/Gopher-style) built from the X1/X3 pieces.

    Quality, language-ID, and text normalization are all narrow per-row
    expressions computed in a single projection (no joins between the
    stages); the only shuffle is the final dedup groupBy on normalized text,
    with min-id survivorship and the survivor's stats carried via min_by.
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_chars = F.length(text_col)
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    len_norm = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    quality = F.round(
        F.lit(0.4) * stop_ratio + F.lit(0.3) * (F.lit(1.0) - punct_ratio) + F.lit(0.3) * len_norm,
        6,
    )
    scores = lang_scores(text_col)
    langs = list(scores)
    best = F.greatest(*[scores[x] for x in langs])
    pred = F.lit("und")
    for x in reversed(langs):
        pred = F.when(scores[x] == best, F.lit(x)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)

    scored = df.select(
        F.col(id_col).alias("doc_id"),
        normalize_text(text_col).alias("_norm"),
        n_tok.cast("int").alias("n_tokens"),
        quality.alias("quality_score"),
        pred.alias("pred_lang"),
    )
    filtered = scored.filter(
        (F.col("quality_score") >= min_quality) & (F.col("pred_lang") == lang)
    )
    return (
        filtered.groupBy("_norm")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by(F.struct("n_tokens", "quality_score"), "doc_id").alias("_p"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            "doc_id",
            F.col("_p.n_tokens").alias("n_tokens"),
            F.col("_p.quality_score").alias("quality_score"),
            "n_copies",
        )
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_token_fraction``: 1 - distinct_tokens / n_tokens (how much of
      the doc is repeated vocabulary);
    - ``top_token_fraction``: occurrences of the most frequent token / n;
    - ``top_bigram_fraction``: same for 2-grams (catches boilerplate that
      unigram stats miss).

    Shape: explode to (doc_id, gram) rows, count per (doc_id, gram), then
    re-aggregate per doc — two hash aggregations over the SAME doc_id-first
    grouping (map-side combine collapses each doc's gram multiset before
    any shuffle).  This is the form that scales to arbitrarily long
    documents; a per-row higher-order-function fold would be O(distinct x
    n) per doc and melt on 10k-token documents.

    All fractions rounded to 6dp for cross-engine hash stability.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    base = df.select("doc_id", toks.alias("_t"))
    uni = base.select("doc_id", F.explode("_t").alias("gram"))
    # single-token docs produce an empty bigram array -> dropped by explode;
    # re-attached via left join with fraction 0.0
    big = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, size(_t) - 1),"
                " i -> concat_ws(' ', element_at(_t, i), element_at(_t, i + 1)))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )

    def per_doc(grams, out_prefix):
        return (
            grams.groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(
                F.sum("c").alias(f"{out_prefix}_n"),
                F.count(F.lit(1)).alias(f"{out_prefix}_distinct"),
                F.max("c").alias(f"{out_prefix}_top"),
            )
        )

    u = per_doc(uni, "u")
    b = per_doc(big, "b")
    return (
        u.join(b, "doc_id", "left")
        .select(
            "doc_id",
            F.col("u_n").cast("int").alias("n_tokens"),
            F.round(1.0 - F.col("u_distinct") / F.col("u_n"), 6).alias("dup_token_fraction"),
            F.round(F.col("u_top") / F.col("u_n"), 6).alias("top_token_fraction"),
            F.round(
                F.coalesce(F.col("b_top") / F.col("b_n"), F.lit(0.0)), 6
            ).alias("top_bigram_fraction"),
        )
    )


#: PII patterns kept in the Java-regex ∩ RE2 dialect subset (no lookaround)
#: so the DuckDB oracle runs the identical pattern.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: count and redact email addresses and phone numbers.

    Narrow per-row regexp projection — no shuffle, whole-stage codegen;
    the redacted text replaces matches with typed placeholders so
    downstream dedup/fingerprints treat all redacted variants alike.
    """
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0)).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), 0)).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ).alias("redacted"),
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (portable across
    engines — both Spark and DuckDB ship md5)."""
    return df.select(
        "doc_id", F.md5(normalize_text(text_col)).alias("fingerprint")
    )


def _char_grams_expr(arr_col: str, window: int) -> Column:
    """All ``window``-grams of a char-array column as O(window) slices.

    ``substring(s, i, w)`` re-scans the string prefix to find code point
    ``i`` (UTF8String indexing is linear), so a transform over positions is
    O(len²) per row; splitting to a char array once and slicing is O(len x
    window).  Strings shorter than ``window`` yield one gram: the whole
    string (``slice`` just stops at the end), matching the substring form.
    """
    return F.expr(
        f"transform(sequence(0, greatest(size({arr_col}) - {window}, 0)), "
        f"i -> array_join(slice({arr_col}, i + 1, {window}), ''))"
    )


def fingerprint_rolling(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min xxhash64 over all
    ``window``-grams of the NORMALIZED text (so both rolling_fp and exact_fp
    are invariant under whitespace-only edits).  xxhash64 is Spark-specific →
    rows-only correctness check (no DuckDB oracle).

    Normalization and the char split are bound to named intermediate
    columns so each evaluates once per row; grams come from array slices,
    not per-position substring (linear, not quadratic, in doc length —
    see _char_grams_expr)."""
    normed = df.select("doc_id", normalize_text(text_col).alias("_norm"))
    chars = normed.select("doc_id", "_norm", F.split("_norm", "").alias("_c"))
    return chars.select(
        "doc_id",
        F.array_min(
            F.transform(_char_grams_expr("_c", window), lambda g: F.xxhash64(g))
        ).alias("rolling_fp"),
        F.md5(F.col("_norm")).alias("exact_fp"),
    )


def fingerprint_rolling_portable(
    df: DataFrame, text_col: str = "text", window: int = 8
) -> DataFrame:
    """``fingerprint_rolling`` with the portable md5-prefix hash family
    (operators/dedup.portable_hash_expr) instead of xxhash64 — every step
    is ANSI-SQL-replayable, so the winnowing fingerprint gets a full
    value-hash driver oracle (registry_ext.x3_fingerprint_portable).  The
    per-gram md5 is ~2x xxhash64's cost; production fingerprinting keeps
    the fast path."""
    from .dedup import portable_hash_expr

    normed = df.select("doc_id", normalize_text(text_col).alias("_norm"))
    chars = normed.select("doc_id", "_norm", F.split("_norm", "").alias("_c"))
    return chars.select(
        "doc_id",
        F.array_min(
            F.transform(_char_grams_expr("_c", window), portable_hash_expr)
        ).alias("rolling_fp"),
        F.md5(F.col("_norm")).alias("exact_fp"),
    )


def tfidf_top_terms(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms: (doc_id, token, tf, score, rank).

    score = tf * ln((N + 1) / (df_t + 1)) with N = corpus size and df_t =
    number of documents containing the token.  Every arithmetic step is the
    same scalar double expression on any engine, so results are
    oracle-checkable (no aggregation-order-sensitive float sums).

    Shuffle shape: explode -> one (doc_id, token) aggregation (map-side
    combine collapses repeats) -> token document-frequencies derived FROM
    that aggregation (no second scan of the corpus) and broadcast back
    (vocabulary << corpus) -> one doc_id-partitioned window for the
    top-k rank.  Ties broken by token text for determinism.
    """
    n_docs = df.count()  # driver-side scalar: one count job, reused as a literal
    tf = (
        df.select("doc_id", F.explode(F.split(normalize_text(text_col), WS)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    score = F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df_t") + 1.0))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(F.broadcast(doc_freq), "token")
        .select("doc_id", "token", "tf", F.round(score, 6).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    *,
    chunk_size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """RAG-style document chunking: overlapping fixed-width character
    windows (``chunk_size`` chars every ``stride`` chars, so consecutive
    chunks overlap by ``chunk_size - stride``).

    Entirely a narrow transform — ``sequence`` generates the chunk start
    offsets per row and ``explode`` fans them out, so there is NO shuffle
    and no Python: at 100 TB this pipelines through whole-stage codegen at
    scan speed, and the ~chunk_size/stride output amplification streams
    straight to the sink without ever materializing a document's chunk
    list.

    Emits ``(doc_id, chunk_idx, chunk_start, chunk_len, n_tokens,
    chunk_md5)`` — the chunk text itself is carried as an md5 so
    downstream exact-dedup of chunks (the common next step) joins on a
    16-byte key instead of a 200-char string.
    """
    starts = F.expr(
        f"sequence(1, greatest(length({text_col}), 1), {stride})"
    )
    return (
        df.select("doc_id", text_col)
        .filter(F.col(text_col).isNotNull())
        .select(
            "doc_id",
            F.split(text_col, "").alias("_c"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        # bind the chunk text ONCE per row (it feeds three outputs below —
        # an inline substring would re-evaluate per use, each re-scanning
        # the string prefix to find the code-point offset; the array slice
        # is O(chunk_size) regardless of chunk_start)
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.expr(
                f"array_join(slice(_c, chunk_start, {chunk_size}), '')"
            ).alias("_chunk"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.length("_chunk").cast("int").alias("chunk_len"),
            F.size(F.split(F.trim("_chunk"), r"\s+")).cast("int").alias("n_tokens"),
            F.md5("_chunk").alias("chunk_md5"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 keyword retrieval over the corpus: top-``k`` documents for a
    bag of query terms.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the Lucene form — always
    positive), tf component = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Every aggregate is integer (tf, df, dl) until the final per-doc score,
    which sums |query| scalar doubles and rounds to 6 dp — so the whole
    ranking is engine-portable and oracle-checkable.

    Shuffle shape: one (doc, token) aggregation builds tf for the query
    terms ONLY (filter before the groupBy — the full vocabulary never
    shuffles); df and avgdl are tiny aggregates broadcast back; the final
    top-k is a TakeOrderedAndProject, not a global sort.  At corpus scale
    this is the score-everything path; serving-latency retrieval uses the
    inverted index (x3_inverted_index) to visit only posting lists."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(text_col), WS)).alias("token"),
    ).filter(F.col("token") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    qt = toks.filter(F.col("token").isin(query_terms))
    tf = qt.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    return per_doc.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1): per-document repetition-free
    heuristics a pretraining pipeline applies before any model-based
    filter.  Emitted as one row per doc with the measured signals, one
    boolean per rule, and the conjunctive ``keep`` verdict, so downstream
    consumers can re-weight individual rules without recomputing signals.

    Rules (thresholds from the paper, closed-form over the text):
      * 50 <= word count <= 100,000
      * mean word length in [3, 10]
      * symbol-to-word ratio (``#`` or ``...``) <= 0.1
      * >= 80% of words contain at least one alphabetic character
      * >= 2 stopword hits (the closed STOPWORDS set)

    Scale shape: a single narrow projection — no shuffle, no UDF; every
    signal is a codegen built-in over the token array.  Mean word length
    uses ``len(text minus whitespace) / n_words`` (identical to summing
    token lengths, but one regexp_replace instead of an aggregate fold).
    """
    sig = _gopher_signals(text_col)
    return df.select(
        "doc_id",
        sig["n_words"].cast("int").alias("n_words"),
        F.round(sig["mean_wl"], 6).alias("mean_word_len"),
        F.round(sig["alpha_ratio"], 6).alias("alpha_word_ratio"),
        F.round(sig["symbol_ratio"], 6).alias("symbol_ratio"),
        sig["stop_hits"].cast("int").alias("stop_hits"),
        sig["r_words"].alias("rule_word_count"),
        sig["r_mwl"].alias("rule_mean_word_len"),
        sig["r_sym"].alias("rule_symbol_ratio"),
        sig["r_alpha"].alias("rule_alpha_words"),
        sig["r_stop"].alias("rule_stopwords"),
        sig["keep"].alias("keep"),
    )


def gopher_keep_expr(text_col: str = "text") -> Column:
    """The conjunctive Gopher ``keep`` verdict of :func:`gopher_rules` as a
    single row-local boolean Column — for pipelines that only gate on the
    verdict and do not need the per-rule signal columns (x9_curation_v4
    applies it as an inline ``filter`` instead of a semi-join against the
    full ``gopher_rules`` relation, which would duplicate the upstream
    plan subtree).  Built from the SAME signal expressions as
    :func:`gopher_rules` (shared ``_gopher_signals``), so the verdict
    cannot drift — same thresholds, same expressions, row for row."""
    return _gopher_signals(text_col)["keep"]


def _gopher_signals(text_col: str) -> dict[str, Column]:
    """The Gopher rule signal/verdict expressions, shared by
    :func:`gopher_rules` (full report) and :func:`gopher_keep_expr`
    (verdict-only inline gate)."""
    t = tokens(text_col)
    n_words = F.size(t)
    nd = n_words.cast("double")
    mean_wl = F.length(F.regexp_replace(F.col(text_col), r"\s", "")).cast("double") / nd
    alpha_ratio = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nd
    symbol_ratio = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"(#|\.\.\.)"), 0)).cast("double")
        / nd
    )
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    r_words = (n_words >= 50) & (n_words <= 100_000)
    r_mwl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    r_sym = symbol_ratio <= 0.1
    r_alpha = alpha_ratio >= 0.8
    r_stop = stop_hits >= 2
    return {
        "n_words": n_words,
        "mean_wl": mean_wl,
        "alpha_ratio": alpha_ratio,
        "symbol_ratio": symbol_ratio,
        "stop_hits": stop_hits,
        "r_words": r_words,
        "r_mwl": r_mwl,
        "r_sym": r_sym,
        "r_alpha": r_alpha,
        "r_stop": r_stop,
        "keep": r_words & r_mwl & r_sym & r_alpha & r_stop,
    }


def _bigram_rows(df: DataFrame, id_col: str, text_col: str, extra: list[str]) -> DataFrame:
    """Non-distinct word bigram OCCURRENCES as rows (DSIR counts every
    occurrence; the dedup shingle helper deliberately dedupes per-doc)."""
    t = df.select(
        F.col(id_col),
        *extra,
        F.split(normalize_text(text_col), r"\s+").alias("_t"),
    )
    grams = F.when(
        F.size("_t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_t") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("_t", i + 1), F.element_at("_t", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return t.select(F.col(id_col), *extra, F.explode(grams).alias("gram"))


def dsir_logweights(
    df: DataFrame,
    target_pred,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    barrier: str | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    ``log p_target(x) - log p_raw(x)`` under hashed-bigram bag-of-ngrams
    models, the score DSIR Gumbel-top-k samples to select pretraining data
    matching a target domain.

    ``target_pred`` is a boolean Column defining the target subset (e.g.
    ``F.col("lang") == "en"``).  Features are word-bigram occurrences
    hashed into ``n_buckets`` buckets with the portable md5-prefix hash
    (operators/dedup.portable_hash_expr), so the DuckDB oracle replays the
    whole pipeline.  Bucket probabilities use add-one smoothing.

    Scale shape (reworked round 11): the corpus-sized bigram extraction
    (normalize + split + bigram HOF + md5 bucket hash) runs EXACTLY ONCE —
    it feeds a single ``groupBy(id, bucket)`` count whose output is
    bounded at ``docs x n_buckets`` rows and is lineage-barriered with
    ``localCheckpoint``, so neither downstream consumer re-extracts
    (the previous shape evaluated the extraction twice: once for the
    bucket distributions, once for the per-doc join — measured 2x the
    query under honest materialization).  The map-side combine also
    collapses the doc-keyed shuffle from every-bigram rows to
    <= n_buckets rows per doc.  Bucket distributions then aggregate the
    small relation to ``n_buckets`` rows; totals derive from those rows,
    never a second corpus scan; the per-doc score joins the broadcast
    log-ratio table and sums ``count * lw`` per doc.  Docs with <2
    tokens carry weight 0.

    ``barrier``: ``"local"`` (default) truncates lineage with
    ``localCheckpoint`` — fast but NOT fault-tolerant (a lost executor
    fails the query); ``"persist"`` uses a DISK_ONLY persist that
    recomputes lost blocks — the deploy-honest choice on preemptible
    fleets.  See operators/barrier.py.
    """
    from .barrier import extraction_barrier
    from .dedup import portable_hash_expr

    bg = _bigram_rows(
        df.withColumn("_is_tgt", target_pred), id_col, text_col, ["_is_tgt"]
    ).select(
        F.col(id_col),
        "_is_tgt",
        (portable_hash_expr("gram") % F.lit(n_buckets)).alias("b"),
    )
    # one extraction pass -> bounded (id, bucket) counts; _is_tgt is
    # constant per doc so max() preserves it through the group
    doc_bk = extraction_barrier(
        bg.groupBy(id_col, "b").agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("_is_tgt")).alias("_is_tgt"),
        ),
        mode=barrier,
    )
    dist = doc_bk.groupBy("b").agg(
        F.sum("n").alias("n_r"),
        F.sum(F.when(F.col("_is_tgt"), F.col("n")).otherwise(0)).alias("n_t"),
    )
    totals = dist.agg(
        F.sum("n_r").alias("t_r"), F.sum("n_t").alias("t_t")
    )
    lut = dist.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(
                (F.col("n_t") + 1).cast("double")
                / (F.col("t_t") + n_buckets).cast("double")
            )
            - F.log(
                (F.col("n_r") + 1).cast("double")
                / (F.col("t_r") + n_buckets).cast("double")
            )
        ).alias("lw"),
    )
    per_doc = (
        doc_bk.join(F.broadcast(lut), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("lw")).alias("_w"))
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.round(F.coalesce(F.col("_w"), F.lit(0.0)), 6).alias("dsir_logweight"),
    )


def hashing_trick(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 64,
) -> DataFrame:
    """Feature hashing (the "hashing trick"): map each token to one of
    ``n_features`` buckets by hash and count per-document occurrences —
    long-form ``(id, feature, tf)`` rows, the sparse bag-of-words input a
    linear model / clustering step consumes without ever materializing a
    vocabulary.

    The whole point at 100 TB: NO vocabulary pass, no string dictionary to
    broadcast, no OOV handling — the feature space is fixed up front and
    every executor maps tokens independently (narrow projection), so the
    only exchange is the final (id, feature) count aggregation with
    map-side combine.  Collisions are the accepted trade (Weinberger et
    al.); raise ``n_features`` to dilute them.  The portable md5-prefix
    hash keeps bucket assignment ANSI-SQL-replayable; swap in xxhash64 for
    production throughput.
    """
    from .dedup import portable_hash_expr

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalize_text(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.select(
            "id", (portable_hash_expr("tok") % n_features).cast("int").alias("feature")
        )
        .groupBy("id", "feature")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(F.col("id").alias(id_col), "feature", "tf")
    )


#: pinned BPE merges table for the ENCODE path (x3_bpe_encode) — the
#: artifact a tokenizer TRAINING loop (x3_bpe_pair_counts is its inner
#: argmax) would emit, frozen here so encode is deterministic and
#: DuckDB-replayable.  Priority order is position in the list.  Entries
#: chain (th+e -> the, an+d -> and), exercising the merged-symbol-
#:  as-operand case.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("an", "d"),
    ("o", "r"), ("e", "s"), ("t", "i"), ("s", "t"), ("a", "r"),
    ("o", "u"), ("l", "e"), ("o", "f"), ("i", "s"), ("in", "g"),
)

def bpe_encode_expr(word_col: Column | str, merges=BPE_MERGES) -> Column:
    """Array-of-tokens column: ``word_col`` greedily encoded with the
    pinned ``merges`` table — the per-document APPLY half of BPE (the
    training half's argmax relation is x3_bpe_pair_counts).

    Plan shape: every symbol is wrapped in its OWN leading and trailing
    space (``" a  b  c "`` — adjacent symbols show a double space), and
    each merge in priority order becomes ONE chained
    ``replace(" a  b " -> " ab ")`` call.  Because no two symbols share a
    delimiter, a match never consumes the boundary the NEXT eligible pair
    needs, so one leftmost non-overlapping replace pass is EXACTLY the
    reference greedy merge pass (a shared single-space delimiter is not:
    on a run like ``aaaaaaaa`` it pairs (1,2),(4,5),(7,8) and strands
    symbols that fixpoint iteration can never re-pair — caught by the
    reference-implementation test).  Sentinel spaces also make token
    boundaries unforgeable without regex lookarounds, which DuckDB's RE2
    lacks, so the oracle replays the identical chain.  Everything is
    whole-stage-codegen string built-ins — the merges table is bounded
    and lives IN the plan (the broadcast-table analogue for literal-sized
    state); no shuffle, no UDF."""
    c = F.col(word_col) if isinstance(word_col, str) else word_col
    # " a  b  c " — every symbol wrapped by its own spaces on both sides
    spaced = F.regexp_replace(c, r"(.)", r" $1 ")
    for a, b in merges:
        spaced = F.replace(spaced, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.split(F.trim(spaced), " +")


def bpe_encode_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges=BPE_MERGES,
) -> DataFrame:
    """Per-word BPE encoding of a corpus: ``(id, word_idx, token_idx,
    token)`` rows — normalize, whitespace-split, encode each word with
    :func:`bpe_encode_expr`, posexplode twice.  Both explodes are narrow;
    nothing shuffles.  Concatenating a word's tokens in order recovers
    the word exactly (merges only concatenate adjacent symbols) — the
    round-trip property the tests pin."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(normalize_text(text_col))).alias("word_idx", "w"),
    ).filter(F.length("w") >= 1)
    return words.select(
        "id",
        "word_idx",
        F.posexplode(bpe_encode_expr("w", merges)).alias("token_idx", "token"),
    )

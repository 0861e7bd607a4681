"""Arrow pandas_udf surface + IVF ANN invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.operators import similarity, vectorized


def test_pandas_udf_cosine_agrees_with_jvm_fold(spark, sf_dir):
    """The Arrow path and the JVM fold must agree after 6dp rounding —
    the invariant any numpy/torch-backed scorer must keep."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 55)).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
    )
    pairs = F.broadcast(q).join(c, how="cross")
    jvm = pairs.withColumn(
        "cosine_jvm",
        F.round(
            similarity.dot_expr("qv", "cv")
            / (
                F.sqrt(similarity.norm_sq_expr("qv"))
                * F.sqrt(similarity.norm_sq_expr("cv"))
            ),
            6,
        ),
    )
    both = vectorized.cosine_scores_pandas(jvm).select(
        "q_id", "cand_id", "cosine_jvm", "cosine_pandas"
    )
    rows = both.collect()
    assert rows
    mismatched = [r for r in rows if abs(r.cosine_jvm - r.cosine_pandas) > 1e-9]
    assert not mismatched, mismatched[:5]


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.q_id, r.cand_id) for r in similarity.brute_force_topk(emb, k=5, n_queries=10).collect()}
    approx_rows = similarity.ivf_bucketed_ann(
        emb, k=5, n_queries=10, n_centroids=16, n_probe=4
    ).collect()
    approx = {(r.q_id, r.cand_id) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # 4/16 cells probed on near-uniform vectors: moderate recall expected
    assert recall >= 0.3, f"IVF recall {recall}"
    # per-query k results, each a genuine cosine
    from collections import Counter

    per_q = Counter(r.q_id for r in approx_rows)
    assert all(v <= 5 for v in per_q.values())


def test_ivf_every_corpus_vector_assigned_once(spark, sf_dir):
    """Cell assignment must be a partition: each vector in exactly one cell."""
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    # reach into the operator's assignment stage via its public result:
    # probing with ALL centroids (n_probe = n_centroids) must return the
    # same top-k as brute force restricted to the corpus
    full_probe = similarity.ivf_bucketed_ann(
        emb, k=3, n_queries=5, n_centroids=8, n_probe=8
    )
    exact = similarity.brute_force_topk(emb, k=3, n_queries=5)
    a = {(r.q_id, r.cand_id, r.rank) for r in full_probe.collect()}
    b = {(r.q_id, r.cand_id, r.rank) for r in exact.collect()}
    assert a == b, f"full-probe IVF != brute force: {a ^ b}"


def test_sentence_udtf_matches_builtin(spark, sf_dir):
    """The Python UDTF and the JVM posexplode twin must produce identical
    (doc_id, sentence_idx, sentence) rows — the validation pattern for any
    future imperative UDTF."""
    from etl_for_ecol_fusion_database_spark.catalog import load_table
    from etl_for_ecol_fusion_database_spark.operators import vectorized

    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
        # corpus text is punctuation-free; inject real multi-sentence docs so
        # the split path is actually exercised
        .unionByName(
            spark.createDataFrame(
                [
                    (1_000_001, "First sentence. Second one! Third? Yes."),
                    (1_000_002, "No trailing split here"),
                ],
                "doc_id long, text string",
            )
        )
    )
    fast = vectorized.sentences_builtin(docs)
    SentenceSplit = vectorized.sentence_split_udtf()
    spark.udtf.register("sentence_split", SentenceSplit)
    docs.createOrReplaceTempView("_udtf_docs")
    slow = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    assert fast.count() > 50  # non-vacuous: documents do split

"""X1 deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (SURVEY.md §2.11; north-star training-data ops).

Scale design notes (the 100 TB posture):

- *Exact* dedup is one hash-partitioned groupBy on the dedup key — the
  map-side partial aggregation collapses duplicates before the shuffle.
- *MinHash LSH* avoids the O(n²) pair space: signatures are computed per-row
  (narrow), banding explodes each doc into ``n_bands`` rows, and candidate
  generation is a self-equi-join on (band, band_hash) — shuffle keyed on the
  band hash, so only colliding docs ever meet.  Verification re-checks exact
  Jaccard on the (small) candidate set.
- *SimHash* reduces each doc to 64 bits; near-pairs at hamming<=3 are found
  with the standard 4-block pigeonhole trick (equality join per block).
- All-pairs variants (``ngram_jaccard_pairs``) are for oracle checking at
  test scale and bound their left side explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Deterministic exact dedup: one row per duplicate group with the
    surviving (minimum) id and the group size.  ``dropDuplicates`` keeps an
    *arbitrary* row — min-id survivorship makes results reproducible across
    runs/partitionings."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Return the deduplicated rows themselves (min-id survivor per key)."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=key_cols + [id_col], how="left_semi")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(text_col: str, n: int = 2) -> Column:
    """Distinct word n-gram shingles of normalized text (arrays stay
    JVM-side; no UDF)."""
    toks = F.split(normalize_text(text_col), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    gram = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, gram).otherwise(F.array_distinct(toks))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (oracle-checkable candidate-pair scoring)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.1,
    max_id: int | None = 200,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity above ``threshold``.

    O(n²) in the bounded id range (``max_id``) — the oracle-checkable
    ground truth that the LSH path approximates.  jaccard = |A∩B| / |A∪B|
    over *distinct* shingle sets, rounded to 6dp.
    """
    base = df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    if max_id is not None:
        base = base.filter(F.col("id") < max_id)
    a = base.alias("a")
    b = base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed i, min over shingles of xxhash64(shingle
    ⊕ seed).  Vectorized array expressions — one pass over the shingle set
    per row, no UDF, no shuffle."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, i.cast("string")))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 2,
    num_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.1,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding, verified with
    exact Jaccard on the candidates only.

    rows_per_band = num_hashes / n_bands; two docs collide if any band of
    their signatures is identical.  The band join shuffles on
    (band_idx, band_hash) — duplicate-heavy keys stay together, everything
    else never meets (the property that makes this run at 100 TB where the
    O(n²) exact join cannot).
    """
    r = num_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, n).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = base.select(
        "id",
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",", F.slice(F.col("sig"), b * r + 1, r).cast("array<string>")
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.round(inter.cast("double") / union.cast("double"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array: per-bit weighted vote over
    xxhash64(token).  Pure array/bitwise expressions (no UDF): for each bit
    position, count tokens with the bit set vs total, set the bit if votes
    are positive."""
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    n_tok = F.size(tokens_col)

    def bit_vote(i: int) -> Column:
        ones = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << i).cast("long")) != 0)
        )
        # bit set iff ones > zeros  <=>  2*ones > n
        return F.when((ones * 2) > n_tok, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for i in range(63):  # keep sign bit clear: stable positive longs
        out = out.bitwiseOR(bit_vote(i))
    return out


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    toks = F.split(normalize_text(text_col), r"\s+")
    return df.select(F.col(id_col).alias("id"), simhash64(toks).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs at hamming distance <= ``max_hamming`` via the 4-block
    pigeonhole: any pair within hamming 3 agrees exactly on at least one of
    four 16-bit blocks, so four equality joins (shuffle on block value)
    replace the O(n²) comparison."""
    fps = simhash_fingerprints(df, id_col, text_col)
    blocks = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("blk"),
    ).select("id", "simhash", "blk.block_idx", "blk.block_val")
    a = blocks.alias("a")
    b = blocks.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_id: int | None = 200,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold over a bounded id range
    (oracle-checkable exact form; the LSH-bucketed scale path lives in
    operators/similarity.py)."""
    from .similarity import cosine_expr, with_norm

    base = with_norm(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v"
    )
    if max_id is not None:
        base = base.filter(F.col("id") < max_id)
    a = base.alias("a")
    b = base.alias("b")
    sim = cosine_expr("a.v", "b.v", "a.norm", "b.norm")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

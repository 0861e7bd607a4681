"""X6 sampling / dataset-split operators for training-data pipelines.

Deterministic, shuffle-free where possible:

- ``hash_split``: train/val/test assignment from a multiplicative hash of
  the id — a narrow per-row projection (NO shuffle, no RNG state), so the
  same row lands in the same split on any cluster size, any partitioning,
  any execution order.  That reproducibility-by-construction is the
  property a 100 TB curation pipeline needs (re-running the split after an
  upstream refresh must not migrate documents between train and test).
- ``stratified_sample``: exact per-stratum fraction via rank-over-hash —
  one shuffle on the stratum key, bounded output per stratum.

The hash is pure integer arithmetic (Knuth multiplicative hashing) rather
than ``xxhash64`` so the DuckDB oracle can evaluate the identical
expression; for string keys at production scale, pass
``id_expr=F.xxhash64(...)`` (rows-only check then applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Knuth's multiplicative constant (2^32 / phi); id*KNUTH mod 2^31-ish
#: decorrelates sequential ids.  Every use reduces the id mod 2^31-1 BEFORE
#: multiplying (see _reduced): (2^31-1) * KNUTH ≈ 5.7e18 < 2^63-1, so the
#: int64 product can never overflow for ANY bigint id — Spark with ANSI off
#: would wrap silently and DuckDB would error, breaking oracle parity.
KNUTH = 2654435761

#: Mersenne prime 2^31-1 — modulus for rank-over-hash orderings (keeps the
#: hash in int32 range while remaining replayable in ANSI-SQL BIGINT math).
_P31 = 2_147_483_647


def _reduced(c: Column) -> Column:
    """id reduced mod 2^31-1 so the subsequent *KNUTH product fits int64.

    Identity for ids below 2^31-1 (every fixture/test id), so oracle
    values are unchanged at test scale; at petabyte-scale id ranges it is
    the difference between a defined hash and silent int64 wraparound.
    Oracle SQL mirrors it as ``(expr % 2147483647)`` (ids are
    non-negative, so DuckDB's signed % equals pmod).
    """
    return F.pmod(c, F.lit(_P31))

#: modulus for split bucketing — 1000 buckets => per-mille split weights
N_BUCKETS = 1000


def split_bucket(id_col: Column | str, *, salt: int = 0) -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from an integer id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(_reduced(c + F.lit(salt)) * F.lit(KNUTH), F.lit(N_BUCKETS)).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    weights: dict[str, int] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Assign each row to a named split with per-mille ``weights``
    (default train/val/test = 800/100/100).

    Narrow projection — no shuffle, no sampling RNG; the assignment is a
    pure function of the id, so it is stable under repartitioning,
    re-execution, and incremental appends (new rows get assigned without
    touching old ones).  ``salt`` derives independent re-splits.
    """
    weights = weights or {"train": 800, "val": 100, "test": 100}
    if sum(weights.values()) != N_BUCKETS:
        raise ValueError(f"weights must sum to {N_BUCKETS}: {weights}")
    bucket = split_bucket(id_col, salt=salt)
    expr: Column | None = None
    hi = 0
    for name, w in weights.items():
        hi += w
        cond = bucket < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.select("*", bucket.alias("bucket"), expr.alias("split"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    *,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    salt: int = 0,
) -> DataFrame:
    """Exact deterministic per-stratum sample: rank rows within each
    stratum by hash-of-id and keep ``ceil(fraction * n_stratum)``.

    Unlike ``df.sampleBy`` (Bernoulli — approximate counts, RNG-seeded
    per-partition and therefore partitioning-sensitive), this is exact and
    reproducible: one shuffle on the stratum key, both window functions
    (rank + stratum size) share that single partitioning.

    Skew note: a hot stratum concentrates on one reducer; at 100 TB with a
    dominant stratum, pre-aggregate per-stratum counts separately and use a
    bucket-threshold filter (rank-free) instead — same semantics when ids
    are hash-distributed.
    """
    w = Window.partitionBy(strata_col)
    order = Window.partitionBy(strata_col).orderBy(
        split_bucket(id_col, salt=salt).asc(), F.col(id_col).asc()
    )
    return (
        df.select(
            "*",
            F.row_number().over(order).alias("_rn"),
            F.count(F.lit(1)).over(w).alias("_n"),
        )
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rn", "_n")
    )


def per_key_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    *,
    n: int = 5,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-key downsample: keep at most ``n`` rows per key,
    chosen by rank over a hash of the id (ties broken by the id itself).

    This is the reproducible replacement for per-key reservoir sampling: a
    true reservoir is order- and partitioning-dependent, while rank-over-
    hash picks the SAME ``n`` rows for a key on any cluster layout and is
    stable under re-runs and appends that don't touch the chosen ids.  The
    canonical use is capping a dominant source/user/domain's contribution
    to a training mix (the "no key may exceed n examples" rule).

    One shuffle on the key; the window's top-n filter plans as
    WindowGroupLimit, so each reducer keeps an n-row heap per key instead
    of sorting whole groups.  The hash is portable integer arithmetic
    (same family as ``split_bucket``) so an ANSI-SQL oracle can replay the
    selection exactly.
    """
    rank_key = F.pmod(_reduced(F.col(id_col) + F.lit(salt)) * F.lit(KNUTH), F.lit(_P31))
    w = Window.partitionBy(*key_cols).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.select("*", F.row_number().over(w).cast("int").alias("sample_rank"))
        .filter(F.col("sample_rank") <= n)
    )


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    *,
    id_col: str = "doc_id",
    k: int = 100,
    group_cols: list[str] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows via priority sampling
    (Duffield–Lund–Thorup): priority = weight / u with u a deterministic
    uniform in (0, 1] derived from the id hash; keep the k largest
    priorities.  Heavier rows win proportionally more often, yet the whole
    draw is a pure function of the data — reproducible across cluster
    sizes, partitionings, and re-runs (the reproducibility property a
    100 TB curation pipeline needs; RNG-seeded ``sample()`` is
    partitioning-sensitive).

    Plan shape: global top-k compiles to TakeOrderedAndProject (per-
    partition heaps + single k-row merge, no global sort); grouped top-k is
    one shuffle on the group key with a rank-filter window (Spark applies
    WindowGroupLimit so partial top-k happens map-side).

    Both u and the priority are single IEEE-754 correctly-rounded
    divisions, so a DuckDB oracle evaluating the same expression gets
    bit-identical doubles — the draw is engine-portable, not just
    seed-stable.
    """
    u = (split_bucket(id_col, salt=salt) + F.lit(1)) / F.lit(N_BUCKETS)
    prio = (F.col(weight_col).cast("double") / u).alias("priority")
    keyed = df.select("*", prio)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col("priority").desc(), F.col(id_col).asc()
        )
        return (
            keyed.select("*", F.row_number().over(w).alias("_rn"))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    return keyed.orderBy(F.col("priority").desc(), F.col(id_col).asc()).limit(k)


def pack_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    budget: int = 2048,
    ids_per_bucket: int = 10_000,
) -> DataFrame:
    """Sequential shard packing: walk documents in ``id_col`` order and cut
    a new shard whenever the running ``size_col`` total passes ``budget``
    (shard_id = exclusive-prefix-sum DIV budget) — how training pipelines
    group documents into ~fixed-token shards/sequences.

    A naive global cumulative sum is ``Window.orderBy`` with no partition
    key — one task does all the work.  This implementation makes the
    prefix sum DISTRIBUTED with the classic two-phase shape:

    1. derive a deterministic coarse bucket ``id DIV ids_per_bucket``
       (dense integer ids make this an order-preserving range partition
       with no sampling pass, unlike ``repartitionByRange``);
    2. per-bucket running sums under one (bucket)-partitioned window;
    3. per-bucket totals cumulated into bucket OFFSETS by a second window
       over the tiny bucket-total relation (thousands of rows, safe to
       single-partition), broadcast back.

    cum_exclusive = bucket_offset + in-bucket running sum - own size, so
    every row's shard is a pure function of the data — stable across
    cluster sizes and re-runs.
    """
    out, cum_excl = _exclusive_prefix_sum(
        df, id_col=id_col, size_col=size_col, ids_per_bucket=ids_per_bucket
    )
    return out.select(
        *[c for c in df.columns],
        F.floor(cum_excl / F.lit(budget)).cast("int").alias("shard_id"),
    )


def _exclusive_prefix_sum(df, *, id_col, size_col, ids_per_bucket):
    """Distributed exclusive prefix sum of ``size_col`` in ``id_col`` order
    (the two-phase bucket shape documented on :func:`pack_shards`).
    Returns (joined frame, exclusive-cumsum Column over it)."""
    bucket = (F.col(id_col) / F.lit(ids_per_bucket)).cast("long")
    sized = df.select(
        "*",
        bucket.alias("_bkt"),
        F.col(size_col).cast("bigint").alias("_sz"),
    )
    w_run = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = sized.withColumn("_run", F.sum("_sz").over(w_run))
    totals = sized.groupBy("_bkt").agg(F.sum("_sz").alias("_tot"))
    w_off = (
        Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        F.col("_bkt").alias("_obkt"),
        (F.sum("_tot").over(w_off) - F.col("_tot")).alias("_off"),
    )
    out = run.join(F.broadcast(offsets), run._bkt == F.col("_obkt"))
    return out, F.col("_off") + F.col("_run") - F.col("_sz")


def concat_chunks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    seq_len: int = 2048,
    ids_per_bucket: int = 10_000,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence layout: documents are laid end
    to end in ``id_col`` order and the token stream is cut into fixed
    ``seq_len`` training sequences — unlike :func:`pack_shards` (which only
    assigns each doc to ONE shard), a document here may SPAN sequences, and
    the output records exactly where each doc's tokens land:

      ``seq_start`` / ``seq_end``  — first/last training sequence touched
      ``offset_in_seq``            — the doc's first token's position in
                                     ``seq_start``
      ``n_seqs``                   — how many sequences the doc spans

    This is the layout map a dataloader needs to materialize attention-
    masked packed batches.  Same distributed two-phase prefix sum as
    pack_shards (per-bucket windows + broadcast bucket offsets — no global
    single-partition window over the data); every output value is integer
    arithmetic on the exclusive cumsum, so the whole layout is replayable
    in ANSI SQL and stable across cluster sizes.  Zero-token docs occupy no
    stream positions: they report the sequence the cursor is in, span 0.
    """
    out, cum_excl = _exclusive_prefix_sum(
        df, id_col=id_col, size_col=size_col, ids_per_bucket=ids_per_bucket
    )
    start = F.floor(cum_excl / F.lit(seq_len))
    end = F.floor((cum_excl + F.col("_sz") - 1) / F.lit(seq_len))
    empty = F.col("_sz") == 0
    return out.select(
        *[c for c in df.columns],
        start.cast("int").alias("seq_start"),
        F.when(empty, start).otherwise(end).cast("int").alias("seq_end"),
        (cum_excl % F.lit(seq_len)).cast("int").alias("offset_in_seq"),
        F.when(empty, F.lit(0))
        .otherwise(end - start + 1)
        .cast("int")
        .alias("n_seqs"),
    )


def domain_mixture(
    df: DataFrame,
    domain_col: str = "lang",
    *,
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """Temperature-scaled domain mixture for training-data composition:
    re-weight each domain's sampling rate by ``n_d^alpha`` (alpha < 1
    upsamples small domains / downsamples dominant ones — the standard
    multilingual/source-mixing scheme), then assign each document an
    integer repeat count whose domain-average equals the target rate.

    rate_d = (n_d^alpha / sum_d n_d^alpha) * N / n_d, rounded to 6 dp;
    the integer part repeats every doc, and the fractional part converts
    to an exact per-mille threshold against the deterministic id-hash
    bucket — so n_repeats is a pure function of the data (reproducible
    across partitionings and re-runs, no RNG), and the realized per-domain
    repeat mass matches the target rate to 1/1000.

    Scale shape: the domain table is a tiny aggregate (|domains| rows)
    BROADCAST back onto the corpus — one map-side join, no data-sized
    shuffle beyond the count groupBy.  alpha=0.5 uses sqrt (correctly
    rounded in IEEE-754 on both Spark and DuckDB, unlike pow), keeping the
    6-dp-rounded rates engine-portable for the driver oracle.
    """
    if alpha != 0.5:
        raise ValueError("only alpha=0.5 (sqrt) is portably deterministic")
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("_denom"),
        F.sum("n_docs").alias("_n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "_dom",
        "n_docs",
        F.round(
            F.sqrt(F.col("n_docs").cast("double"))
            / F.col("_denom")
            * F.col("_n_total").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("target_rate"),
    )
    thous = F.round(F.col("target_rate") * 1000).cast("long")
    keyed = df.join(
        F.broadcast(rates), df[domain_col] == F.col("_dom")
    ).select(
        id_col,
        F.col("_dom").alias("domain"),
        "target_rate",
        (
            (thous / 1000).cast("long")
            + F.when(
                split_bucket(id_col, salt=salt) < (thous % 1000).cast("int"), 1
            ).otherwise(0)
        ).cast("int").alias("n_repeats"),
    )
    return keyed


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    epoch: int = 0,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic epoch-wise global permutation: assign every row a
    dense position 0..N-1 in hash-of-(id, epoch) order — the "shuffle the
    corpus each epoch" step of a training dataloader, computed WITHOUT a
    single-partition global window.

    Two-phase shape (same trick as ``pack_shards``): the hash space is cut
    into ``n_buckets`` contiguous RANGES, rows rank within their range
    (one shuffle, ``n_buckets``-way parallel), and range totals — a
    ``n_buckets``-row relation — prefix-sum on the driver-sized side and
    broadcast back as offsets.  position = range_offset + local_rank.
    Every epoch is an independent permutation (the epoch salts the hash);
    the result is a pure function of (id, epoch) — stable under
    repartitioning, cluster size, and re-runs, which is what makes
    training order reproducible across restarts.  Integer-only arithmetic
    keeps the permutation ANSI-SQL-replayable.
    """
    h = F.pmod(_reduced(F.col(id_col) + F.lit(epoch * 40_503)) * F.lit(KNUTH), F.lit(_P31))
    rng = (_P31 + n_buckets - 1) // n_buckets
    based = df.select("*", h.alias("_h"), (h / F.lit(rng)).cast("int").alias("_rng"))
    w_rank = Window.partitionBy("_rng").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    ranked = based.withColumn("_rn", F.row_number().over(w_rank))
    totals = based.groupBy("_rng").agg(F.count(F.lit(1)).alias("_tot"))
    w_off = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = totals.select(
        F.col("_rng").alias("_orng"),
        (F.sum("_tot").over(w_off) - F.col("_tot")).alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), ranked._rng == F.col("_orng"))
        .select(
            *df.columns,
            (F.col("_off") + F.col("_rn") - 1).cast("long").alias("position"),
        )
    )

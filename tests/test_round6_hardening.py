"""Round-6 hardening regressions from the sources/streaming review:
Morton-key sign-bit/wrap overflow, stateful-reducer empty-chunk and
null-value handling, deterministic dedup-sink survivorship, JDBC sharded
reads without bounds, and the idempotent-create error mask."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.sources import maintenance, readers, writers
from etl_for_ecol_fusion_database_spark.streaming import events_stream as es


# ---------------------------------------------------------------------------
# z-order: the interleaved key must fit a NON-NEGATIVE long
# ---------------------------------------------------------------------------


def test_zorder_key_expr_rejects_sign_bit_overflow():
    """4 cols x 16 bits would put a bit at position 63 (the sign bit:
    shiftleft(1L, 63) = Long.MIN_VALUE, so such rows sort FIRST) and 5+
    cols would wrap shifts mod 64 — both silently corrupt the clustering,
    so the expression builder must refuse."""
    with pytest.raises(ValueError, match="sign bit"):
        maintenance.zorder_key_expr(["a", "b", "c", "d"], n_bits=16)


def test_zorder_by_narrows_bits_and_keys_stay_non_negative(spark):
    """zorder_by with 4 columns must auto-narrow to 15 bits/column and
    produce strictly non-negative Morton keys even for max-rank rows."""
    df = spark.createDataFrame(
        [(i * 7 % 100, i * 13 % 100, i * 3 % 100, i) for i in range(100)],
        "a long, b long, c long, d long",
    )
    out = maintenance.zorder_by(df, ["a", "b", "c", "d"], n_bits=16, n_partitions=2)
    assert out.count() == 100 and set(out.columns) == {"a", "b", "c", "d"}
    # the key itself is dropped from the output; re-derive it the way
    # zorder_by does at the narrowed width and pin non-negativity
    ranks = df.select(
        *[(F.col(c) % F.lit(1 << 15)).alias(f"r_{c}") for c in ["a", "b", "c", "d"]]
    )
    keyed = ranks.select(
        maintenance.zorder_key_expr(["r_a", "r_b", "r_c", "r_d"], n_bits=15).alias("k")
    )
    assert keyed.filter(F.col("k") < 0).count() == 0


def test_zorder_rank_null_and_constant_columns_never_null_the_key(spark):
    """A NULL value (or a constant column, where width_bucket's min==max
    degrades to NULL) must not null the Morton key: least() skips the
    NULL rank and the row keeps clustering on its other columns."""
    df = spark.createDataFrame(
        [(1.0, 3.0, 1), (None, 3.0, 2), (2.0, 3.0, 3)], "a double, c double, i long"
    )
    out = maintenance.zorder_by(df, ["a", "c"], n_bits=4, n_partitions=1)
    assert out.count() == 3  # no row lost, no NULL-key partition explosion


# ---------------------------------------------------------------------------
# stateful reducers: empty Arrow chunks and null values
# ---------------------------------------------------------------------------


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_running_latest_fn_survives_empty_and_null_chunks():
    """Arrow chunking can deliver empty frames (iloc[-1] would raise), and
    pandas sorts NaT LAST — a null-ts row must not mask the chunk's real
    events (batch max_by treats null smallest) nor TypeError on a null
    event_type tie."""
    state = _FakeGroupState()
    ts1 = pd.Timestamp("2024-01-01 10:00:00")
    ts2 = pd.Timestamp("2024-01-01 11:00:00")
    chunks = [
        pd.DataFrame({"ts": [], "event_type": []}),
        pd.DataFrame({"ts": [ts2, None, ts1], "event_type": ["view", "click", None]}),
    ]
    (out,) = list(es._running_latest_fn((7,), iter(chunks), state))
    row = out.iloc[0]
    assert row.user_id == 7
    assert row.n_events == 3  # nulls still count toward count(*)
    assert row.latest_status == "view" and row.latest_ts == ts2.to_pydatetime()

    # an all-null follow-up chunk must leave the fold untouched
    (out2,) = list(
        es._running_latest_fn(
            (7,),
            iter([pd.DataFrame({"ts": [None], "event_type": [None]})]),
            state,
        )
    )
    row2 = out2.iloc[0]
    assert row2.n_events == 4 and row2.latest_status == "view"


def test_running_value_stats_ignores_nulls_like_batch_agg():
    """An all-null first batch must not poison the running max with NaN
    (Python max(NaN, m) sticks at NaN forever); F.sum/F.max ignore nulls,
    so the fold must too — while n stays count(*)."""
    import math

    proc = es.make_running_value_stats_processor()

    class _H:
        def getValueState(self, name, schema):
            class _S:
                _v = None

                def exists(self):
                    return self._v is not None

                def get(self):
                    return self._v

                def update(self, v):
                    self._v = v

            return _S()

    proc.init(_H())
    b_null = pd.DataFrame({"value": [None, None]}, dtype="float64")
    (o1,) = list(proc.handleInputRows((1,), iter([b_null]), None))
    r1 = o1.iloc[0]
    assert r1.n_events == 2 and r1.total_value == 0.0 and r1.max_value is None

    (o2,) = list(proc.handleInputRows((1,), iter([pd.DataFrame({"value": [5.0]})]), None))
    r2 = o2.iloc[0]
    assert r2.n_events == 3 and r2.total_value == 5.0
    assert r2.max_value == 5.0 and not math.isnan(r2.max_value)


# ---------------------------------------------------------------------------
# foreachBatch dedup sink: deterministic min-first survivorship
# ---------------------------------------------------------------------------


def test_foreach_batch_dedup_sink_keeps_min_survivor(spark, tmp_path):
    """Two rows sharing the key must deterministically keep the one that
    sorts first on the non-key columns — dropDuplicates kept an arbitrary
    row, so a failure-replay could persist a different survivor."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "b", 20.0), (1, "a", 10.0), (2, "c", 30.0)],
        "k long, tag string, v double",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k long, tag string, v double").parquet(src)
    q = es.foreach_batch_dedup_sink(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), key_cols=["k"]
    )
    q.awaitTermination(120)
    rows = {
        r.k: (r.tag, r.v)
        for r in spark.read.option("basePath", str(tmp_path / "out"))
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    assert rows == {1: ("a", 10.0), 2: ("c", 30.0)}


# ---------------------------------------------------------------------------
# JDBC sharded read: no silent 0..1 bounds
# ---------------------------------------------------------------------------


def test_read_table_requires_bounds_with_partition_column(spark):
    src = readers.JdbcSource(url="jdbc:postgresql://h/db", user="u", password="p")
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        src.read_table(spark, "events", partition_column="event_id")


# ---------------------------------------------------------------------------
# idempotent create: corrupt targets surface their real error
# ---------------------------------------------------------------------------


def test_create_if_not_exists_does_not_mask_corrupt_target(spark, sf_dir, tmp_path):
    """A half-written target (unreadable footer) must raise the real
    probe error rather than fall through to a misleading errorifexists
    'path already exists' failure."""
    sink = writers.ParquetSink(base_dir=str(tmp_path))
    bad = tmp_path / "nation_bad"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    df = load_table(spark, sf_dir, "nation")
    with pytest.raises(Exception) as ei:
        sink.create_if_not_exists(spark, df, "nation_bad")
    assert "already exists" not in str(ei.value)


# ---------------------------------------------------------------------------
# LSH plane families: distinct, unbiased
# ---------------------------------------------------------------------------


def test_portable_planes_distinct_up_to_24_bits(spark):
    """The portable plane family must give DISTINCT planes for every bit
    derive_n_bits can return (4..24) — the old (b*37 + i*101) % 7 form had
    period 7 in b (37 = 2 mod 7), capping effective buckets at 2^7 while
    the occupancy budget assumed 2^bits: quadratic pair volume at scale."""
    def plane(b, seed=42):
        def coef(i):
            x = (b * 1000003 + i * 8191 + 17 + seed) % 2147483647
            return ((x * x) % 2147483647 + x * 48271) % 2147483647 % 7 - 3

        return tuple(coef(i) for i in range(64))

    planes = [plane(b) for b in range(24)]
    assert len(set(planes)) == 24


def test_production_plane_components_unbiased(spark):
    """_plane_component must be ~uniform in [-1, 1]: the signed-% form
    spanned (-3, 1) with mean -1, so every hyperplane pointed the same
    way and non-negative corpora collapsed into one bucket."""
    from etl_for_ecol_fusion_database_spark.operators.similarity import (
        _plane_component,
    )

    df = spark.range(2000).select(F.col("id").cast("int").alias("pos"))
    stats = df.select(
        *[_plane_component(b, F.col("pos"), seed=42).alias(f"c{b}") for b in range(4)]
    ).agg(
        *[F.avg(f"c{b}").alias(f"m{b}") for b in range(4)],
        *[F.min(f"c{b}").alias(f"lo{b}") for b in range(4)],
        *[F.max(f"c{b}").alias(f"hi{b}") for b in range(4)],
    ).collect()[0]
    for b in range(4):
        assert -0.1 < stats[f"m{b}"] < 0.1, f"bit {b} biased: {stats[f'm{b}']}"
        assert stats[f"lo{b}"] >= -1.0 and stats[f"hi{b}"] <= 1.0000006


def test_nonnegative_corpus_spreads_over_buckets(spark):
    """A strictly non-negative corpus (the ReLU/TF-IDF case) must spread
    over many buckets — under the signed-% bias every v.p was negative and
    the whole corpus landed in bucket 0."""
    from etl_for_ecol_fusion_database_spark.operators import similarity

    df = spark.range(256).select(
        F.col("id"),
        F.expr(
            "transform(sequence(0, 15), i ->"
            " CAST(pmod(hash(id, i), 100) AS DOUBLE) / 100.0)"
        ).alias("v"),
    )
    sigs = similarity.hyperplane_signatures_df(df, "id", "v", n_bits=6, seed=42)
    n_buckets = sigs.select("bucket").distinct().count()
    assert n_buckets > 8, f"non-negative corpus collapsed to {n_buckets} buckets"


def test_multiprobe_radius_generalizes_and_saturates(spark, sf_dir):
    """Radius is a real recall dial now (was silently capped at 2): recall
    must be monotone in the radius, and radius == n_bits probes EVERY
    bucket, so the result must equal the brute-force top-k exactly."""
    from etl_for_ecol_fusion_database_spark.catalog import load_table
    from etl_for_ecol_fusion_database_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.q_id, r.cand_id)
        for r in similarity.brute_force_topk(emb, k=5, n_queries=6).collect()
    }

    def recall(radius):
        got = {
            (r.q_id, r.cand_id)
            for r in similarity.lsh_bucketed_ann(
                emb, k=5, n_queries=6, n_bits=6, multiprobe=radius
            ).collect()
        }
        return len(exact & got) / len(exact)

    r2, r3, r6 = recall(2), recall(3), recall(6)
    assert r3 >= r2, f"radius-3 recall {r3} < radius-2 {r2}"
    assert r6 == 1.0, f"radius == n_bits must be exhaustive, recall {r6}"


# ---------------------------------------------------------------------------
# operator-review hardening: direct regressions for the new guards
# ---------------------------------------------------------------------------


def test_cdc_merge_apply_seq_col_last_op_wins(spark):
    """A CDC feed with several ops per key must compact to the
    highest-sequence op: trailing D deletes even after updates, trailing U
    updates even after a delete.  Without seq_col the duplicate-key feed
    would silently emit one output row PER change row."""
    from etl_for_ecol_fusion_database_spark.operators import cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    changes = spark.createDataFrame(
        [
            (1, "U", "a2", 10),
            (1, "D", None, 20),   # trailing delete wins for id=1
            (2, "D", None, 10),
            (2, "U", "b2", 20),   # trailing update wins for id=2
            (4, "I", "d", 10),
            (4, "U", "d2", 20),   # trailing insert-update wins for id=4
        ],
        "id long, op string, val string, lsn long",
    )
    got = {
        (r.id, r.val)
        for r in cdc.merge_apply(base, changes, key="id", seq_col="lsn").collect()
    }
    assert got == {(2, "b2"), (3, "c"), (4, "d2")}


def test_scd2_null_safe_change_detection(spark):
    """Transitions INTO and OUT OF a NULL attribute must open/close
    intervals: plain != evaluates NULL against a NULL neighbor and the
    filter silently drops the change row."""
    import datetime

    from etl_for_ecol_fusion_database_spark.operators import history

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "A"),
        (1, t0 + datetime.timedelta(hours=1), 2, None),   # A -> NULL
        (1, t0 + datetime.timedelta(hours=2), 3, None),   # no change
        (1, t0 + datetime.timedelta(hours=3), 4, "B"),    # NULL -> B
        (2, t0, 5, None),                                  # first row NULL attr
        (2, t0 + datetime.timedelta(hours=1), 6, None),    # no change
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = history.scd2_intervals(
        df, key="user_id", ts_col="ts", attr_col="event_type", tiebreak="event_id"
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.event_type)
    assert by_user[1] == ["A", None, "B"], by_user
    assert by_user[2] == [None], by_user


def test_connected_components_raises_on_non_convergence(spark):
    """A chain whose diameter exceeds max_iter must raise, not silently
    return a split component."""
    from etl_for_ecol_fusion_database_spark.operators import graph

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    nodes = spark.range(13)
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(pairs, nodes, id_a="id_a", id_b="id_b", max_iter=2)


def test_salted_join_rejects_right_and_full_outer(spark):
    from etl_for_ecol_fusion_database_spark.operators import skew

    left = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(left, small, "k", how=how, n_salt=4)


# ---------------------------------------------------------------------------
# char-level linearization: slice grams == substring grams, ascii == unicode
# ---------------------------------------------------------------------------


def test_char_grams_expr_matches_substring_form(spark):
    """_char_grams_expr (split-once + O(w) slices) must produce exactly the
    grams of the quadratic substring form it replaced, including the
    shorter-than-window and multi-byte cases."""
    from etl_for_ecol_fusion_database_spark.operators.text import _char_grams_expr

    rows = [("abcdefghij",), ("abc",), ("a",), ("héllo wörld",), ("日本語テスト文字列",)]
    df = spark.createDataFrame(rows, ["s"]).select(
        "s", F.split("s", "").alias("_c")
    )
    for window in (3, 8):
        got = df.select("s", _char_grams_expr("_c", window).alias("g")).collect()
        for r in got:
            n = len(r.s)
            want = (
                [r.s[i : i + window] for i in range(max(n - window + 1, 1))]
                if n > window
                else [r.s]
            )
            assert r.g == want, (r.s, window, r.g, want)


def test_spark_ascii_is_full_code_point_like_duckdb_unicode(spark):
    """The CDC boundary polynomial relies on Spark ascii == DuckDB unicode
    for EVERY character — BMP and astral — or boundaries diverge between
    engine and oracle."""
    import duckdb

    chars = ["a", " ", "~", "é", "ß", "€", "日", "𝄞"]
    got = [
        r[0]
        for r in spark.createDataFrame([(c,) for c in chars], ["ch"])
        .select(F.ascii("ch"))
        .collect()
    ]
    want = [
        duckdb.execute("SELECT unicode(?)", [c]).fetchone()[0] for c in chars
    ]
    assert got == want


def test_cdc_boundary_rate_and_linearity(spark, sf_dir):
    """The polynomial boundary hash must cut at ~1/modulus of positions
    (a biased family collapses chunking into whole-doc chunks), and chunk
    rows must tile each document exactly (no gaps/overlaps) — re-pinned
    here for the gear-hash family specifically."""
    from etl_for_ecol_fusion_database_spark.operators import dedup
    from etl_for_ecol_fusion_database_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200")
    rows = dedup.cdc_chunk_rows(docs, modulus=64).collect()
    # candidate-position count comes from the SAME normalization the
    # operator applies (round-6 ADVICE: an inline trim/lower/regexp copy
    # would silently drift if normalize_text ever changed)
    n_positions = (
        docs.select(
            F.sum(F.greatest(F.length(normalize_text("text")) - 7, F.lit(1)))
        ).collect()[0][0]
    )
    n_cuts = len(rows) - docs.count()  # first chunk per doc is the sentinel
    rate = n_positions / max(n_cuts, 1)
    assert 32 < rate < 128, f"boundary rate 1/{rate:.0f}, expected ~1/64"

    # linearity/tiling (round-6 ADVICE: the docstring promised this but the
    # body never checked it): per doc, chunks sorted by chunk_idx must
    # start at 1, each next chunk must start exactly where the previous
    # one ended, and the concatenation must reproduce the normalized text
    # — no gaps, no overlaps, nothing dropped at either end.
    normed = {
        r.id: r.n
        for r in docs.select(
            F.col("doc_id").alias("id"), normalize_text("text").alias("n")
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    assert set(by_doc) == set(normed), "every doc must emit at least one chunk"
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert chunks[0].start == 1
        pos = 1
        for c in chunks:
            assert c.start == pos, (doc_id, c.chunk_idx, c.start, pos)
            pos += len(c.chunk)
        assert "".join(c.chunk for c in chunks) == normed[doc_id], doc_id


def test_portable_hash_expr_matches_duckdb_hex_polynomial(spark):
    """portable_hash_expr is the base of every SQL-replayable hash family
    (MinHash, SimHash, count-min, Bloom, LSH portable twins); its oracle
    twin is the DuckDB hex-digit polynomial over md5's first 12 chars.
    Pin the two bit-for-bit on random strings — ASCII, multi-byte UTF-8
    (md5 hashes the utf-8 BYTES in both engines), punctuation-heavy, and
    the empty string — not just the fixture's mostly-ASCII corpus."""
    import random

    import duckdb

    from etl_for_ecol_fusion_database_spark.operators.dedup import (
        _P_PORT,
        portable_hash_expr,
    )

    rng = random.Random(20260815)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,!?-_éßü€日本語𝄞"
    strings = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        for _ in range(300)
    ]
    got = [
        r.h
        for r in spark.createDataFrame([(s,) for s in strings], "s: string")
        .select(portable_hash_expr("s").alias("h"))
        .collect()
    ]
    sql = (
        "SELECT CAST(list_sum([(strpos('0123456789abcdef', md5(?)[i]) - 1)"
        " * CAST(power(16, 12 - i) AS BIGINT)"
        f" for i in generate_series(1, 12)]) % {_P_PORT} AS BIGINT)"
    )
    con = duckdb.connect()
    want = [con.execute(sql, [s]).fetchone()[0] for s in strings]
    assert got == want

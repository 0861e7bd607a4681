"""Round-6 additions: the codegen JL-projection twin and the oracle
conversions of the last two rows-only showcase entries.

Round-5 VERDICT item #2: register the posexplode + per-(id, j) SUM
reshape beside the interpreted-HOF portable fold.  These tests pin the
property that makes the twin hash-checkable rather than rows-only — the
hash aggregate accumulates each group in exploded row order (one partial
per group, i ascending), which is the same left-to-right order as the
sequential fold, so the two paths must agree BIT-FOR-BIT, not just to a
tolerance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.operators import similarity

SF_CORRECT = "/root/testdata/sf0.01"


def test_jl_fast_path_bit_identical_to_portable_fold(spark):
    """Unrounded doubles from both paths must be equal as Python floats
    (bit-for-bit up to the driver's float64 round-trip) on every
    (vec_id, dim_idx) cell."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    slow = similarity.random_projection(
        emb, "vec_id", "embedding", out_dim=16, seed=42
    ).select("vec_id", F.posexplode("proj").alias("dim_idx", "y"))
    fast = similarity.random_projection_fast(
        emb, "vec_id", "embedding", in_dim=64, out_dim=16, seed=42
    )
    s = {(r.vec_id, r.dim_idx): r.y for r in slow.collect()}
    f = {(r.vec_id, r.dim_idx): r.y for r in fast.collect()}
    assert s.keys() == f.keys() and len(s) >= 16
    diffs = [k for k in s if s[k] != f[k]]
    assert not diffs, f"paths diverge on {len(diffs)} cells, e.g. {diffs[:3]}"


def test_jl_fast_path_partial_agg_and_no_python(spark):
    """The reshape must plan as generate + project + hash aggregate with a
    map-side partial (the exchange carries only partial sums) and no
    Python evaluation anywhere."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    fast = similarity.random_projection_fast(
        emb, "vec_id", "embedding", in_dim=64, out_dim=16, seed=42
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan, plan


# ---------------------------------------------------------------------------
# transformWithState reducer logic (protobuf-free coverage)
# ---------------------------------------------------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_running_value_stats_processor_folds_across_batches():
    """The transformWithState driver worker needs google.protobuf, which
    this container cannot install — so the REDUCER is exercised directly:
    init + handleInputRows over two simulated micro-batches must converge
    to the batch aggregate (commutative monoid fold), and state must
    carry between calls."""
    import pandas as pd

    from etl_for_ecol_fusion_database_spark.streaming.events_stream import (
        make_running_value_stats_processor,
    )

    proc = make_running_value_stats_processor()
    handle = _FakeHandle()
    proc.init(handle)

    b1 = pd.DataFrame({"value": [1.0, 5.0, 2.0]})
    b2 = pd.DataFrame({"value": [10.0]})
    empty = pd.DataFrame({"value": []})

    out1 = list(proc.handleInputRows((7,), iter([b1]), None))
    assert len(out1) == 1
    r1 = out1[0].iloc[0]
    assert (r1.user_id, r1.n_events, r1.total_value, r1.max_value) == (7, 3, 8.0, 5.0)

    # second micro-batch: state from the first must fold in; empty frames
    # must not disturb the accumulator
    out2 = list(proc.handleInputRows((7,), iter([empty, b2]), None))
    r2 = out2[0].iloc[0]
    assert (r2.user_id, r2.n_events, r2.total_value, r2.max_value) == (7, 4, 18.0, 10.0)

    # equals the single-batch aggregate over the concatenation
    allv = pd.concat([b1, b2])["value"]
    assert r2.n_events == len(allv)
    assert r2.total_value == float(allv.sum())
    assert r2.max_value == float(allv.max())
    proc.close()


# ---------------------------------------------------------------------------
# embedding-head memo (driver-side seed/centroid state reused across builds)
# ---------------------------------------------------------------------------


def test_embedding_head_memo_matches_direct_collect_and_caches(spark):
    """_embedding_head must return exactly what the per-build collects it
    replaced returned (vec_id-ascending (id, [float...]) pairs), and a
    second call for the same (fixture, n) must hit the memo (same object),
    so repeated plan builds pay the head-scan job once."""
    from etl_for_ecol_fusion_database_spark.registry_ext._shared import (
        _EMB_HEAD_MEMO,
        _embedding_head,
    )

    _EMB_HEAD_MEMO.pop((SF_CORRECT, 10), None)
    got = _embedding_head(spark, SF_CORRECT, 10)
    direct = (
        load_table(spark, SF_CORRECT, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .filter(F.col("vec_id") < 10)
        .orderBy("vec_id")
        .collect()
    )
    assert got == [(int(r.vec_id), [float(x) for x in r.v]) for r in direct]
    assert [i for i, _ in got] == sorted(i for i, _ in got)
    assert _embedding_head(spark, SF_CORRECT, 10) is got


def test_jl_fast_path_signed_zero_parity(spark):
    """An all-zero vector produces -0.0 terms wherever the plane component
    is negative.  Both paths still emit +0.0: the sequential fold seeds
    its accumulator with +0.0, and Spark's SUM does too (coalesce(sum,
    0.0) + value).  This pins that engine behavior — if SUM ever seeded
    from the first term instead, the fast path would emit -0.0 (which the
    driver canon prints as \"-0\") and the shared-oracle bit-parity
    guarantee would silently break on degenerate vectors."""
    import math

    df = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id: long, embedding: array<double>"
    )
    fast = similarity.random_projection_fast(
        df, "vec_id", "embedding", in_dim=64, out_dim=16, seed=42
    ).collect()
    slow = (
        similarity.random_projection(df, "vec_id", "embedding", out_dim=16, seed=42)
        .select("vec_id", F.posexplode("proj").alias("dim_idx", "y"))
        .collect()
    )
    assert len(fast) == 16 and len(slow) == 16
    for r in fast + slow:
        assert r.y == 0.0 and not math.copysign(1.0, r.y) < 0, r


def test_snap_expr_portable_and_nan_inf_transparent(spark):
    """snap_expr must floor-snap finite doubles and pass NaN/NULL/inf
    through untouched — Spark's floor on DOUBLE returns LONG (NaN would
    silently collapse to 0, infinities saturate), while the oracle-side
    SQL floor is transparent natively, so the Spark side must guard."""
    import math

    rows = spark.createDataFrame(
        [(0.12345649,), (0.12345651,), (-0.12345651,), (-0.1234565,),
         (float("nan"),), (float("inf"),), (float("-inf"),), (None,)],
        "x: double",
    ).select(similarity.snap_expr(F.col("x"), 6).alias("y")).collect()
    ys = [r.y for r in rows]
    assert ys[0] == 0.123456 and ys[1] == 0.123457
    assert ys[2] == -0.123457
    assert ys[3] == -0.123456  # exact half-tie rounds toward +inf
    assert math.isnan(ys[4])
    assert ys[5] == float("inf") and ys[6] == float("-inf")
    assert ys[7] is None


def test_snap_expr_matches_duckdb_floor_on_random_doubles(spark):
    """The portability claim is 'floor(x*1e6+0.5)/1e6 is bit-identical in
    every engine' — pin it against DuckDB on seeded pseudo-random doubles
    across magnitudes (1e-8 .. 1e12, both signs), not just hand-picked
    half-ties.  Bit-exact comparison via struct.pack, no tolerance."""
    import random
    import struct

    import duckdb

    rng = random.Random(20260815)
    xs = [
        rng.uniform(-1.0, 1.0) * (10.0 ** rng.randint(-8, 12))
        for _ in range(500)
    ]
    got = [
        r.y
        for r in spark.createDataFrame([(x,) for x in xs], "x: double")
        .select(similarity.snap_expr(F.col("x"), 6).alias("y"))
        .collect()
    ]
    # createDataFrame preserves row order for a local list; DuckDB replays
    # the same values positionally
    want = [
        duckdb.execute("SELECT floor(? * 1e6 + 0.5) / 1e6", [x]).fetchone()[0]
        for x in xs
    ]
    for x, g, w in zip(xs, got, want):
        assert struct.pack("<d", g) == struct.pack("<d", w), (x, g, w)

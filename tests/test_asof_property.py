"""Property-based check: the union+window as-of join must agree with
DuckDB's native ASOF JOIN on arbitrary small inputs — including duplicate
probe timestamps, empty right sides, keys with no quotes, and equal-time
probe/quote collisions (the inclusive boundary)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_for_ecol_fusion_database_spark.operators.joins import asof_join_backward

KEYS = st.integers(min_value=0, max_value=3)
TIMES = st.integers(min_value=0, max_value=50)
# nullable payloads: a NULL in one payload column of the matched quote must
# surface as NULL (not fall back to an older quote) — the row-tearing case
VALS = st.one_of(st.none(), st.integers(min_value=0, max_value=1000))

probes = st.lists(st.tuples(KEYS, TIMES), min_size=1, max_size=25)
# unique (key, time) on the quote side: the as-of result is otherwise
# nondeterministic (documented operator precondition)
quotes = st.lists(
    st.tuples(KEYS, TIMES, VALS, VALS), max_size=25, unique_by=lambda q: (q[0], q[1])
)


@given(probes=probes, quotes=quotes)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_duckdb(spark, probes, quotes):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probes)], "k LONG, t LONG, probe_id LONG"
    )
    right_rows = [(k, t, v, v2) for (k, t, v, v2) in quotes]
    right = spark.createDataFrame(
        right_rows or [(None, None, None, None)], "k LONG, qt LONG, v LONG, v2 LONG"
    )
    if not right_rows:
        right = right.filter("k IS NOT NULL")
    got = {
        (r.probe_id, r.asof_v, r.asof_v2)
        for r in asof_join_backward(
            left, right, on="k", left_time="t", right_time="qt", payload=["v", "v2"]
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE probes(k BIGINT, t BIGINT, probe_id BIGINT)")
    con.executemany(
        "INSERT INTO probes VALUES (?, ?, ?)",
        [(k, t, i) for i, (k, t) in enumerate(probes)],
    )
    con.execute("CREATE TABLE quotes(k BIGINT, qt BIGINT, v BIGINT, v2 BIGINT)")
    if right_rows:
        con.executemany("INSERT INTO quotes VALUES (?, ?, ?, ?)", right_rows)
    expected = set(
        con.execute(
            """
            SELECT p.probe_id, q.v, q.v2
            FROM probes p ASOF LEFT JOIN quotes q
              ON p.k = q.k AND p.t >= q.qt
            """
        ).fetchall()
    )
    assert got == expected


def test_asof_null_payload_no_row_tearing(spark):
    """The matched quote's NULL must be preserved: per-column
    last(ignorenulls) would tear the row — asof_a falling back to the older
    quote while asof_b comes from the newer one."""
    left = spark.createDataFrame([(1, 12, 0)], "k LONG, t LONG, probe_id LONG")
    right = spark.createDataFrame(
        [(1, 5, 1, 10), (1, 10, None, 20)], "k LONG, qt LONG, a LONG, b LONG"
    )
    out = asof_join_backward(
        left, right, on="k", left_time="t", right_time="qt", payload=["a", "b"]
    ).collect()
    assert out[0].asof_a is None and out[0].asof_b == 20


def test_asof_exclusive_boundary(spark):
    """inclusive=False: an equal-time quote must NOT be visible."""
    left = spark.createDataFrame([(1, 10, 0)], "k LONG, t LONG, probe_id LONG")
    right = spark.createDataFrame([(1, 10, 99), (1, 5, 42)], "k LONG, qt LONG, v LONG")
    incl = asof_join_backward(
        left, right, on="k", left_time="t", right_time="qt", payload=["v"]
    ).collect()
    excl = asof_join_backward(
        left, right, on="k", left_time="t", right_time="qt", payload=["v"], inclusive=False
    ).collect()
    assert incl[0].asof_v == 99
    assert excl[0].asof_v == 42


# ---------------------------------------------------------------------------
# interval-overlap join property check
# ---------------------------------------------------------------------------

#: epoch-second interval endpoints spanning several bucket widths
_STARTS = st.integers(min_value=0, max_value=10_000)
_LENGTHS = st.integers(min_value=0, max_value=4_000)
_intervals = st.lists(
    st.tuples(_STARTS, _LENGTHS), min_size=1, max_size=20
)


@given(left=_intervals, right=_intervals, bucket=st.sampled_from([600, 1800, 7200]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_overlap_matches_naive(spark, left, right, bucket):
    """The bucketed overlap rewrite must equal the naive O(n*m) predicate
    for arbitrary intervals (zero-length included) and any bucket width —
    multi-bucket double-matches must dedupe away, boundary-touching
    intervals (closed bounds) must match."""
    from pyspark.sql import functions as F

    from etl_for_ecol_fusion_database_spark.operators.joins import (
        interval_overlap_join,
    )

    ldf = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(left)],
        "lid LONG, ls LONG, le LONG",
    ).select(
        "lid",
        F.timestamp_seconds("ls").alias("ls"),
        F.timestamp_seconds("le").alias("le"),
    )
    rdf = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(right)],
        "rid LONG, rs LONG, re LONG",
    ).select(
        "rid",
        F.timestamp_seconds("rs").alias("rs"),
        F.timestamp_seconds("re").alias("re"),
    )
    naive = {
        (r.lid, r.rid)
        for r in ldf.join(
            rdf, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
        ).collect()
    }
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_seconds=bucket,
            left_keep=["lid"], right_keep=["rid"],
        ).collect()
    }
    assert got == naive

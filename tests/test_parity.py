"""Correctness gate: every registered query with an oracle must match the
DuckDB result on the sf0.001 fixtures (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from etl_for_ecol_fusion_database_spark import registry

from .parity import compare

ORACLE_NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    problems = compare(spark, sf_dir, name, registry.QUERIES[name], registry.ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_runs(spark, sf_dir):
    for name, fn in registry.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_results_driver_canonicalizable(spark, sf_dir, name):
    """The driver canonicalizes EVERY query's Spark result through pandas —
    even rows-only ones — so unhashable cells (arrays) err there.  Assert
    each no-oracle query survives the same canonicalization locally."""
    from .parity import driver_canon_hash

    pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    driver_canon_hash(pdf)  # must not raise


def test_sketch_accuracy(spark, sf_dir):
    """The sketch-accuracy report (round-4 shape: one row per metric with
    the exact value and a tolerance boolean): every sketch must land within
    its configured error, and the exact values must agree with the exact
    profile query."""
    exact = registry.QUERIES["x3_profile_lineitem"](spark, sf_dir).collect()[0]
    report = {
        r.metric: r
        for r in registry.QUERIES["x3_profile_sketch"](spark, sf_dir).collect()
    }
    assert set(report) == {
        "approx_distinct_orders",
        "approx_distinct_parts",
        "median_quantity",
        "median_price",
    }
    assert all(r.within_tolerance for r in report.values())
    assert report["approx_distinct_orders"].exact_value == exact.n_orders
    assert report["approx_distinct_parts"].exact_value == exact.n_parts
    assert (
        float(exact.min_qty)
        <= report["median_quantity"].exact_value
        <= float(exact.max_qty)
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert [c.lower() for c in df.columns] == ["collision_id", "case_nbr"]

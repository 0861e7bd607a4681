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
    """HLL/quantile sketches must land within their configured error of the
    exact profile."""
    exact = registry.QUERIES["x3_profile_lineitem"](spark, sf_dir).collect()[0]
    approx = registry.QUERIES["x3_profile_sketch"](spark, sf_dir).collect()[0]
    assert abs(approx.approx_orders - exact.n_orders) / exact.n_orders < 0.05
    assert abs(approx.approx_parts - exact.n_parts) / exact.n_parts < 0.05
    quantiles = [approx.qty_q50, approx.qty_q95, approx.qty_q99]
    assert float(exact.min_qty) <= quantiles[0] <= float(exact.max_qty)
    assert quantiles == sorted(quantiles)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert [c.lower() for c in df.columns] == ["collision_id", "case_nbr"]

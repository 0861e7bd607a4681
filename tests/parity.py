"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
fixtures and compares row count, column names, and an order-insensitive
multiset of normalized row values.  Used by tests/test_parity.py as the
pre-commit correctness gate (the driver does the authoritative run at
sf=0.01).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from etl_for_ecol_fusion_database_spark.catalog import FIXTURE_TABLES, table_path


def _normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.10g}")
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    return v


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def compare(spark, sf_dir: str, name: str, spark_fn, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty => parity)."""
    problems: list[str] = []
    sdf = spark_fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()

    if sorted(scols) != sorted(ocols):
        problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")

    s_idx = [scols.index(c) for c in sorted(scols)]
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    s_set = sorted(
        (tuple(_normalize(row[i]) for i in s_idx) for row in srows),
        key=repr,
    )
    o_set = sorted(
        (tuple(_normalize(row[i]) for i in o_idx) for row in orows),
        key=repr,
    )
    if s_set != o_set:
        diff_s = [r for r in s_set if r not in o_set][:3]
        diff_o = [r for r in o_set if r not in s_set][:3]
        problems.append(
            f"values differ; spark-only sample={diff_s} oracle-only sample={diff_o}"
        )
    return problems

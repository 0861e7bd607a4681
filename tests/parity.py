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
import pandas as pd

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


def driver_canon_hash(pdf: pd.DataFrame) -> int:
    """Mirror of the DRIVER's pandas canonicalization: sort columns by name,
    sort rows by all columns, hash values.  Representation-sensitive on
    purpose — a Spark DECIMAL vs DuckDB float64 (or an array cell, which is
    unhashable) must fail here the way it fails on the driver, even when the
    underlying values are numerically equal.

    Calibrated against CORRECTNESS_r01: the driver treats Spark's
    datetime.date objects and DuckDB's datetime64[us] as equal (u1/j1/j2/w2
    were hash-green with DATE output columns), so temporal columns are
    normalized to pandas datetime before hashing; Decimal-vs-float64 and
    array cells stay strict (they were the r01 reds)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype == object:
            sample = col.dropna()
            if len(sample) and all(
                isinstance(v, (datetime.date, datetime.datetime)) for v in sample
            ):
                pdf[c] = pd.to_datetime(col).astype("datetime64[ns]")
        elif str(col.dtype).startswith("datetime64"):
            pdf[c] = col.astype("datetime64[ns]")
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


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

    # driver-faithful hash check: canonicalize both sides through pandas the
    # way the driver does, so decimal-vs-float64 rendering or unhashable
    # array cells fail HERE instead of only in CORRECTNESS_r{N}.json
    try:
        s_hash = driver_canon_hash(sdf.toPandas())
    except Exception as e:  # noqa: BLE001
        problems.append(f"spark result not driver-canonicalizable: {e!r}")
        return problems
    try:
        o_hash = driver_canon_hash(con.execute(oracle).df())
    except Exception as e:  # noqa: BLE001
        problems.append(f"oracle result not driver-canonicalizable: {e!r}")
        return problems
    if s_hash != o_hash:
        problems.append(
            "driver-style pandas hash differs (representation mismatch — "
            "check output dtypes: decimals should be cast to DOUBLE, arrays "
            "serialized to JSON on both sides)"
        )
    return problems

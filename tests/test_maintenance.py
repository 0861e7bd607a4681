"""Tests for table maintenance: compaction, Z-ordering, storage info."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.sources import maintenance


def _parquet_files(path):
    return [
        f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ]


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(40).write.parquet(src)
    assert len(_parquet_files(src)) == 40
    maintenance.compact_parquet(spark, src, dest, target_file_mb=64)
    out_files = _parquet_files(dest)
    assert len(out_files) < 40
    # lossless: same rows
    before = docs.count()
    after = spark.read.parquet(dest).count()
    assert before == after


def test_compact_scales_file_count_with_target(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "lineitem").write.parquet(src)
    n_small = maintenance.compact_parquet(
        spark, src, str(tmp_path / "d1"), target_file_mb=1
    )
    n_big = maintenance.compact_parquet(
        spark, src, str(tmp_path / "d2"), target_file_mb=1024
    )
    assert n_big <= n_small  # bigger target -> fewer files
    assert n_big >= 1


def test_zorder_key_interleaves_bits(spark):
    """Morton property on a hand-checkable grid: key(x=1,y=0) with 2 bits
    puts x's low bit at position 1 -> key 2; key(0,1) -> 1; key(1,1) -> 3;
    key(2,2) -> 12 (both second bits set)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2)], "a long, b long"
    )
    out = df.select(
        "a", "b", maintenance.zorder_key_expr(["a", "b"], n_bits=2).alias("k")
    ).collect()
    got = {(r["a"], r["b"]): r["k"] for r in out}
    assert got == {(0, 0): 0, (1, 0): 2, (0, 1): 1, (1, 1): 3, (2, 2): 12}


def test_zorder_by_clusters_both_columns(spark, sf_dir, tmp_path):
    """After z-ordering on (l_orderkey, l_partkey) and splitting into
    files, per-file min/max ranges on BOTH columns must be much narrower
    than the global range — the data-skipping property.  A single-column
    sort gives narrow ranges on the sort key only."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    z = maintenance.zorder_by(li, ["l_orderkey", "l_partkey"], n_bits=8, n_partitions=8)
    dest = str(tmp_path / "z")
    z.write.parquet(dest)
    stats = (
        spark.read.parquet(dest)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("ospan"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pspan"),
        )
        .agg(F.avg("ospan").alias("o"), F.avg("pspan").alias("p"), F.count("*").alias("n"))
        .first()
    )
    glob_span = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("o"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("p"),
    ).first()
    assert stats["n"] > 1  # non-vacuous: multiple files
    # every z-column's average per-file span is a fraction of global
    assert stats["o"] < 0.6 * glob_span["o"]
    assert stats["p"] < 0.6 * glob_span["p"]
    # lossless
    assert z.count() == li.count()


def test_table_storage_info(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "t")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(3).write.parquet(dest)
    info = maintenance.table_storage_info(spark, dest)
    assert info.n_files == 3
    assert info.n_rows == docs.count()
    assert info.total_bytes > 0
    assert set(info.columns) == set(docs.columns)

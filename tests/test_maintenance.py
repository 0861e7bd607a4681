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


def _avg_file_spans(spark, dest):
    return (
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


def test_zorder_by_clusters_both_columns(spark, sf_dir, tmp_path):
    """After z-ordering on (l_orderkey, l_partkey) and splitting into
    files, per-file min/max ranges on BOTH columns must be much narrower
    than a single-column sort leaves them — the data-skipping property.

    The second column is asserted RELATIVE to the single-column-sort
    baseline rather than against an absolute fraction of the global
    span: the old ``< 0.6 * global`` bound measured 0.57–0.59 on this
    fixture, and repartitionByRange's reservoir sampling (seeded from
    the RDD id, i.e. session history) jitters the file boundaries a few
    percent — a marginal absolute threshold flaked once per ~10 full
    suite runs while the property itself never regressed."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    z = maintenance.zorder_by(li, ["l_orderkey", "l_partkey"], n_bits=8, n_partitions=8)
    dest = str(tmp_path / "z")
    z.write.parquet(dest)
    stats = _avg_file_spans(spark, dest)
    base_dest = str(tmp_path / "single_sort")
    li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(base_dest)
    base = _avg_file_spans(spark, base_dest)
    glob_span = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("o"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("p"),
    ).first()
    assert stats["n"] > 1 and base["n"] > 1  # non-vacuous: multiple files
    # the z-curve's first column stays far below the global span...
    assert stats["o"] < 0.6 * glob_span["o"]
    # ...and the second column — which a single-column sort leaves at
    # ~the full global span per file — must be substantially tighter
    # than that baseline
    assert base["p"] > 0.9 * glob_span["p"]  # baseline really is unclustered
    assert stats["p"] < 0.75 * base["p"]
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

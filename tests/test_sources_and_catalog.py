"""S-layer tests: catalog reflection, type mapping, DDL generation, routing,
sinks, and the end-to-end ingest pipeline shape (reflect -> map -> create ->
load), mirroring the reference pipelines on parquet."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_for_ecol_fusion_database_spark import catalog, schemas
from etl_for_ecol_fusion_database_spark.plans import fusion_etl
from etl_for_ecol_fusion_database_spark.sources import writers
from etl_for_ecol_fusion_database_spark.sources.readers import (
    JdbcSource,
    mssql_source,
    oracle_source,
)


def test_reflect_columns(spark, sf_dir):
    df = catalog.load_table(spark, sf_dir, "orders")
    refl = catalog.reflect_columns(spark, df, "orders").collect()
    by_name = {r.column_name: r for r in refl}
    assert by_name["o_orderkey"].data_type == "bigint"
    # Spark 4 infers parquet naive timestamps as TIMESTAMP_NTZ
    # (spark.sql.parquet.inferTimestampNTZ.enabled default) — the correct
    # match for the reference's `timestamp without time zone` semantics
    assert by_name["o_orderdate"].data_type == "timestamp_ntz"
    assert [r.column_name for r in sorted(refl, key=lambda r: r.ordinal_position)] == df.columns


def test_constraints_metadata():
    meta = catalog.constraints_metadata("lineitem")
    assert meta["primary_key"] == "l_orderkey,l_linenumber"
    assert ("l_orderkey", "orders", "o_orderkey") in meta["foreign_keys"]
    # reference registry tables preserved (reference.py:1-12)
    assert catalog.PRIMARY_KEYS["ecr_coll_plotting_info"] == "plotting_info_id"


def test_type_mapping_oracle():
    assert schemas.map_source_type("VARCHAR2(50)") == T.StringType()
    assert schemas.map_source_type("NUMBER(10,2)") == T.DecimalType(10, 2)
    assert schemas.map_source_type("NUMBER(5)") == T.IntegerType()
    assert schemas.map_source_type("NUMBER(15)") == T.LongType()
    # 19-38 digit integer NUMBER overflows int64 — must stay DECIMAL(p,0)
    assert schemas.map_source_type("NUMBER(20)") == T.DecimalType(20, 0)
    assert schemas.map_source_type("NUMBER(38)") == T.DecimalType(38, 0)
    assert schemas.map_source_type("NUMBER(18)") == T.LongType()
    assert schemas.map_source_type("DATE") == T.TimestampNTZType()
    assert schemas.map_source_type("BLOB") == T.BinaryType()
    # unmapped defaults to TEXT/String (helper_db_operation.py:235)
    assert schemas.map_source_type("SDO_GEOMETRY") == T.StringType()


def test_type_mapping_mssql():
    assert schemas.map_source_type("nvarchar(255)", "mssql") == T.StringType()
    assert schemas.map_source_type("bit", "mssql") == T.BooleanType()
    assert schemas.map_source_type("datetime", "mssql") == T.TimestampNTZType()
    assert schemas.map_source_type("uniqueidentifier", "mssql") == T.StringType()
    assert schemas.map_source_type("money", "mssql") == T.DecimalType(19, 4)


def test_ddl_generation_with_lineage_column():
    st = schemas.build_struct_type(
        [("ID", "NUMBER(15)", False), ("CASE_NBR", "VARCHAR2(20)", True)]
    )
    ddl = schemas.generate_create_table_ddl(
        "fusion_collisions", st, extra_columns={"source": "STRING"}
    )
    assert "CREATE TABLE IF NOT EXISTS fusion_collisions" in ddl
    assert "id BIGINT NOT NULL" in ddl
    assert "case_nbr STRING" in ddl
    assert "source STRING" in ddl  # the lineage column (S15/§1.4)
    assert schemas.generate_drop_table_ddl("x") == "DROP TABLE IF EXISTS x"


def test_ddl_carries_pk_fk_metadata():
    """The reference emits PK/FK clauses in generated DDL
    (ingest_ecollision_oracle_data.py:29-41); Spark can't enforce them, so
    they must surface as TBLPROPERTIES — pulled from the catalog registries."""
    from etl_for_ecol_fusion_database_spark import catalog

    st = schemas.build_struct_type([("o_orderkey", "NUMBER(15)", False)])
    ddl = schemas.generate_create_table_ddl_for("orders", st)
    assert f"'constraints.primary_key' = '{catalog.PRIMARY_KEYS['orders']}'" in ddl
    col, ref_table, ref_col = catalog.FOREIGN_KEYS["orders"][0]
    assert f"'constraints.foreign_key.0' = '{col} REFERENCES {ref_table}({ref_col})'" in ddl
    # a table with no registered constraints emits no TBLPROPERTIES block
    assert "TBLPROPERTIES" not in schemas.generate_create_table_ddl("unknown_tbl", st)


def test_spark_accepts_ddl_with_constraints(spark, tmp_path):
    st = schemas.build_struct_type([("o_orderkey", "NUMBER(15)", False)])
    ddl = schemas.generate_create_table_ddl(
        "ddl_fk_smoke",
        st,
        primary_key="o_orderkey",
        foreign_keys=[("o_custkey", "customer", "c_custkey")],
    ) + f" LOCATION '{tmp_path}/ddl_fk_smoke'"
    spark.sql("DROP TABLE IF EXISTS ddl_fk_smoke")
    spark.sql(ddl)
    props = {
        r.key: r.value
        for r in spark.sql("SHOW TBLPROPERTIES ddl_fk_smoke").collect()
    }
    assert props.get("constraints.primary_key") == "o_orderkey"
    spark.sql("DROP TABLE IF EXISTS ddl_fk_smoke")


def test_spark_accepts_generated_ddl(spark):
    st = schemas.build_struct_type([("id", "NUMBER(15)", False), ("name", "VARCHAR2(10)", True)])
    with tempfile.TemporaryDirectory() as d:
        ddl = schemas.generate_create_table_ddl(
            "ddl_smoke", st, using="parquet"
        ) + f" LOCATION '{d}/ddl_smoke'"
        spark.sql("DROP TABLE IF EXISTS ddl_smoke")
        spark.sql(ddl)
        cols = {f.name: f.dataType for f in spark.table("ddl_smoke").schema.fields}
        assert cols["id"] == T.LongType()
        spark.sql("DROP TABLE IF EXISTS ddl_smoke")


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """[ext] JSONL corpus read/write: documents round-trip losslessly with
    an explicit schema (no inference pass), partitioned output prunes."""
    from etl_for_ecol_fusion_database_spark.catalog import load_table
    from etl_for_ecol_fusion_database_spark.sources import readers

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "bucket", (F.col("doc_id") % 2).cast("int")
    )
    out = str(tmp_path / "docs_jsonl")
    writers.write_jsonl(docs, out, partition_by=["bucket"])
    back = readers.read_jsonl(spark, out, schema="doc_id LONG, text STRING")
    a = sorted((r.doc_id, r.text) for r in docs.select("doc_id", "text").collect())
    b = sorted((r.doc_id, r.text) for r in back.select("doc_id", "text").collect())
    assert a == b
    # partition pruning: reading one bucket touches only that directory
    one = spark.read.json(f"{out}/bucket=0")
    assert 0 < one.count() < len(a)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    from etl_for_ecol_fusion_database_spark.catalog import load_table
    from etl_for_ecol_fusion_database_spark.sources import readers

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    back = readers.read_csv(spark, out, schema="n_nationkey LONG, n_name STRING")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_reset_schema_and_physical_layout(spark, sf_dir, tmp_path):
    """on_demand_db_query.sql analogues: schema reset (DROP CASCADE +
    recreate) and the pg_indexes-style physical-layout listing (PK +
    bucketing metadata)."""
    from etl_for_ecol_fusion_database_spark import catalog

    catalog.reset_schema(spark, "layout_db", location=str(tmp_path / "wh"))
    orders = catalog.load_table(spark, sf_dir, "orders")
    writers.write_bucketed(orders, "layout_db.orders", bucket_by="o_orderkey", n_buckets=4)
    layout = {
        (r.kind, r.expression)
        for r in catalog.list_physical_layout(spark, "layout_db.orders").collect()
    }
    assert ("primary_key", "o_orderkey") in layout
    assert ("bucket", "o_orderkey") in layout
    # reset drops everything: table must be gone after a second reset
    catalog.reset_schema(spark, "layout_db", location=str(tmp_path / "wh2"))
    assert not spark.catalog.tableExists("layout_db.orders")
    spark.sql("DROP DATABASE IF EXISTS layout_db CASCADE")


def test_dev_prod_routing():
    assert writers.route_table_name("collisions", system="fusion", dev_mode=True) == "fusion_collisions_dev"
    assert writers.route_table_name("collisions", system="oracle") == "oracle_collisions"
    assert writers.route_table_name("fusion_collisions") == "fusion_collisions"


def test_jdbc_reader_options(spark):
    src = oracle_source("dbhost", 1521, "ecol", "u", "p")
    assert src.url == "jdbc:oracle:thin:@//dbhost:1521/ecol"
    assert src.driver == "oracle.jdbc.OracleDriver"
    assert mssql_source("h", "eCollisionAnalytics", "u", "p").url.startswith("jdbc:sqlserver://h;")
    # reader builds without connecting
    r = src.reader(spark)
    assert r is not None


def test_parquet_sink_roundtrip(spark, sf_dir):
    src = catalog.load_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as d:
        sink = writers.ParquetSink(d)
        sink.overwrite(src, "nation")
        assert spark.read.parquet(sink.path("nation")).count() == src.count()
        sink.append(src, "nation")
        assert spark.read.parquet(sink.path("nation")).count() == 2 * src.count()
        # idempotent create: second call must be a no-op
        assert sink.create_if_not_exists(spark, src, "nation2") is True
        assert sink.create_if_not_exists(spark, src, "nation2") is False


def test_ingest_pipeline_shape(spark, sf_dir):
    """The backup_*_to_postgres shape (SURVEY.md §3.1/3.2) on parquet:
    reflect source schema -> route name -> lineage column -> idempotent
    create -> truncate-and-load; verify row counts and lineage values."""
    src = catalog.load_table(spark, sf_dir, "supplier")
    with tempfile.TemporaryDirectory() as d:
        sink = writers.ParquetSink(d)
        target = writers.route_table_name("supplier", system="oracle", dev_mode=True)
        assert target == "oracle_supplier_dev"
        staged = src.withColumn("source", F.lit(fusion_etl.SOURCE_ORACLE))
        sink.overwrite(staged, target)
        out = spark.read.parquet(sink.path(target))
        assert out.count() == src.count()
        assert out.select("source").distinct().collect()[0].source == "eCollision Oracle"
        # dynamic projection to target columns (P2) keeps the intersection
        projected = fusion_etl.project_to_target(staged, ["s_suppkey", "source", "ghost"])
        assert projected.columns == ["s_suppkey", "source"]


def test_fusion_write_overwrite_vs_append(spark, sf_dir):
    df = catalog.load_table(spark, sf_dir, "region")
    with tempfile.TemporaryDirectory() as d:
        fusion_etl.write_fusion_table(df, f"{d}/t", drop_existing=True)
        fusion_etl.write_fusion_table(df, f"{d}/t", drop_existing=True)
        assert spark.read.parquet(f"{d}/t").count() == df.count()  # S11 truncate
        fusion_etl.write_fusion_table(df, f"{d}/t", drop_existing=False)
        assert spark.read.parquet(f"{d}/t").count() == 2 * df.count()  # S14 append


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trip preserves schema + values, and the ORC scan accepts
    pushed filters (native vectorized OrcFileFormat, same engine posture
    as parquet)."""
    from etl_for_ecol_fusion_database_spark.sources.readers import read_orc
    from etl_for_ecol_fusion_database_spark.sources.writers import write_orc

    src = catalog.load_table(spark, sf_dir, "nation")
    write_orc(src, str(tmp_path / "nation_orc"))
    back = read_orc(spark, str(tmp_path / "nation_orc"))
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(F.col("n_nationkey") < 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(n_nationkey), LessThan(n_nationkey,5)" in plan


def test_events_ts_loads_as_timestamp_any_encoding(spark, sf_dir):
    """Fixture-drift canary: the events.ts physical encoding has changed
    between driver rounds (TIMESTAMP(NANOS)-as-long -> TIMESTAMP(MICROS)/
    NTZ).  Whatever the parquet carries, load_table must surface a
    timestamp-family column — if this fails, check the fixture schema
    with pyarrow before debugging anything downstream."""
    dt = catalog.load_table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(dt, (T.TimestampType, T.TimestampNTZType)), dt
    # and the streaming source must agree with the batch loader's clock
    from etl_for_ecol_fusion_database_spark.streaming.events_stream import (
        read_events_stream,
    )

    sdt = read_events_stream(spark, sf_dir).schema["ts"].dataType
    assert isinstance(sdt, T.TimestampType), sdt

"""Source readers (S1-S5): external-DB scans re-expressed as Spark sources.

The reference materializes every source table into driver memory with
``cursor.fetchall()`` (Oracle at /root/reference/helper_db_operation.py:19-26,
MSSQL at :76-83) — all rows transit one Python process.  Here a scan is a
lazy distributed source: JDBC against real Oracle/MSSQL/PG, parquet for the
fixture tables.  Predicate pushdown and column pruning reach the source
automatically (SURVEY.md §4); for JDBC, ``partition_column``/bounds shard the
read across executors — the knob the reference's single-cursor loop cannot
express.

No live Oracle/MSSQL exists in this environment, so the JDBC paths build the
reader configuration (unit-testable) and document the contract; the parquet
paths run for real against the fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    """Connection + sharding spec for an external relational source.

    Maps the reference's connection objects (OracleDB.__init__ at
    helper_db_operation.py:10-17, AnalyticsDB at :66-74, PostgreSQLDB at
    :112-121) onto ``spark.read.format("jdbc")`` options.
    """

    url: str  # e.g. jdbc:oracle:thin:@host:1521/service / jdbc:sqlserver://...
    user: str
    password: str
    driver: str = ""
    fetchsize: int = 10_000
    extra_options: dict[str, str] = field(default_factory=dict)

    def reader(self, spark: SparkSession):
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("user", self.user)
            .option("password", self.password)
            .option("fetchsize", str(self.fetchsize))
        )
        if self.driver:
            r = r.option("driver", self.driver)
        for k, v in self.extra_options.items():
            r = r.option(k, v)
        return r

    def read_table(
        self,
        spark: SparkSession,
        table: str,
        *,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int = 32,
    ) -> DataFrame:
        """S1/S3 full table scan — sharded on the PK when bounds are given
        (each executor reads one slice; nothing funnels through the driver,
        unlike ingest_ecollision_oracle_data.py:96-97).

        ``partition_column`` requires BOTH bounds: Spark clamps the
        partition count to ``upper - lower``, so a fabricated 0..1 default
        would silently collapse the read to one JDBC connection — the
        exact single-cursor bottleneck the sharded read exists to avoid.
        Derive the bounds with a cheap ``SELECT MIN(pk), MAX(pk)`` via
        read_query when the caller does not know them."""
        r = self.reader(spark).option("dbtable", table)
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    "read_table(partition_column=...) needs explicit "
                    "lower_bound and upper_bound — defaulting would clamp "
                    "numPartitions to (upper - lower) and funnel the whole "
                    "table through one JDBC connection"
                )
            r = (
                r.option("partitionColumn", partition_column)
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
                .option("numPartitions", str(num_partitions))
            )
        return r.load()

    def read_query(self, spark: SparkSession, query: str) -> DataFrame:
        """S5 ad-hoc query scan (`pd.read_sql` at
        etl_ecollision_fusion_table_collisions.py:55) — pushed into the
        source engine as a subquery."""
        return self.reader(spark).option("query", query).load()

    def read_sampled(self, spark: SparkSession, table: str, n: int) -> DataFrame:
        """S2/S4 head sample (ROWNUM<=n / TOP n) — ``limit`` is pushed into
        the JDBC subquery by Spark's LimitPushDown where supported."""
        return self.read_table(spark, table).limit(n)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """[ext] JSONL corpus reader — the interchange format LLM training
    corpora ship in (one JSON document per line).  Always pass an explicit
    schema in production: schema inference is a full extra pass over the
    data, which at 100 TB doubles the read."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_csv(
    spark: SparkSession, path: str, schema=None, *, header: bool = True, sep: str = ","
) -> DataFrame:
    """[ext] CSV reader with the same explicit-schema discipline."""
    r = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """[ext] ORC reader — the other columnar interchange format warehouses
    export.  Same engine path as parquet (vectorized scan, predicate
    pushdown, column pruning via Spark's native OrcFileFormat); schema
    travels in the footer so no explicit schema is needed."""
    return spark.read.orc(path)


def oracle_source(host: str, port: int, service: str, user: str, password: str) -> JdbcSource:
    """eCollision Oracle-shaped source (reference env vars at
    ingest_ecollision_oracle_data.py:54-67)."""
    return JdbcSource(
        url=f"jdbc:oracle:thin:@//{host}:{port}/{service}",
        user=user,
        password=password,
        driver="oracle.jdbc.OracleDriver",
        extra_options={"oracle.jdbc.mapDateToTimestamp": "true"},
    )


def mssql_source(host: str, database: str, user: str, password: str) -> JdbcSource:
    """eCollision Analytics (MSSQL)-shaped source
    (ingest_ecollision_analytics_data.py:49-60)."""
    return JdbcSource(
        url=f"jdbc:sqlserver://{host};databaseName={database}",
        user=user,
        password=password,
        driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
    )


def postgres_source(host: str, database: str, user: str, password: str) -> JdbcSource:
    """Fusion PostgreSQL-shaped source (helper_db_operation.py:112-121)."""
    return JdbcSource(
        url=f"jdbc:postgresql://{host}/{database}",
        user=user,
        password=password,
        driver="org.postgresql.Driver",
    )

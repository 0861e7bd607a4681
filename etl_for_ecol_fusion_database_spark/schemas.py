"""External-DB type mapping and DDL generation (S9/S10 layer).

The reference generates PostgreSQL DDL from two hand-written type-mapping
dictionaries — MSSQL->PG (`map_analytics_db_to_postgres`,
/root/reference/helper_db_operation.py:161-192) and Oracle->PG
(`map_oracle_to_postgres`, :194-237, unmapped types defaulting to TEXT at
:235).  Here the target is a Spark ``StructType``; the same source-type
vocabulary maps onto Spark SQL types, and DDL generation emits Spark SQL
``CREATE TABLE`` text instead of PostgreSQL DDL
(ingest_ecollision_oracle_data.py:16-46, ingest_ecollision_analytics_data.py:16-43,
create_empty_tables_for_ecollision_fusion.py:18-47).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# MSSQL ("eCollision Analytics") source types -> Spark types
# (vocabulary of helper_db_operation.py:161-192)
# ---------------------------------------------------------------------------
MSSQL_TO_SPARK: dict[str, T.DataType] = {
    "varchar": T.StringType(),
    "nvarchar": T.StringType(),
    "char": T.StringType(),
    "nchar": T.StringType(),
    "text": T.StringType(),
    "ntext": T.StringType(),
    "int": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ShortType(),
    "bigint": T.LongType(),
    "decimal": T.DecimalType(38, 10),
    "numeric": T.DecimalType(38, 10),
    "money": T.DecimalType(19, 4),
    "smallmoney": T.DecimalType(10, 4),
    "float": T.DoubleType(),
    "real": T.FloatType(),
    "datetime": T.TimestampNTZType(),
    "datetime2": T.TimestampNTZType(),
    "smalldatetime": T.TimestampNTZType(),
    "datetimeoffset": T.TimestampType(),
    "date": T.DateType(),
    "time": T.StringType(),  # Spark has no TIME type (SURVEY.md §1.3)
    "bit": T.BooleanType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "image": T.BinaryType(),
    "uniqueidentifier": T.StringType(),
    "xml": T.StringType(),
}

# ---------------------------------------------------------------------------
# Oracle ("eCollision Oracle") source types -> Spark types
# (vocabulary of helper_db_operation.py:194-237)
# ---------------------------------------------------------------------------
ORACLE_TO_SPARK: dict[str, T.DataType] = {
    "varchar2": T.StringType(),
    "nvarchar2": T.StringType(),
    "char": T.StringType(),
    "nchar": T.StringType(),
    "clob": T.StringType(),
    "nclob": T.StringType(),
    "long": T.StringType(),
    "number": T.DecimalType(38, 10),
    "integer": T.IntegerType(),
    "binary_float": T.FloatType(),
    "binary_double": T.DoubleType(),
    "float": T.DoubleType(),
    "date": T.TimestampNTZType(),  # Oracle DATE carries time -> TIMESTAMP (:214-217)
    "timestamp": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamp with local time zone": T.TimestampType(),
    "boolean": T.BooleanType(),
    "blob": T.BinaryType(),
    "raw": T.BinaryType(),
    "long raw": T.BinaryType(),
    "rowid": T.StringType(),
    "urowid": T.StringType(),
    "xmltype": T.StringType(),
}

#: unmapped source types default to TEXT in the reference
#: (helper_db_operation.py:235) — StringType here.
DEFAULT_TYPE: T.DataType = T.StringType()


def map_source_type(source_type: str, dialect: str = "oracle") -> T.DataType:
    """Map one external type name to a Spark type, reference-style.

    Handles parameterized spellings like ``NUMBER(10,2)`` / ``varchar(50)``
    by matching the base name; NUMBER(p,s) keeps precision/scale when given.
    """
    s = source_type.strip().lower()
    m = re.match(r"^([a-z0-9_ ]+?)\s*\((\d+)\s*(?:,\s*(-?\d+))?\)$", s)
    base, prec, scale = (m.group(1), m.group(2), m.group(3)) if m else (s, None, None)
    table = ORACLE_TO_SPARK if dialect == "oracle" else MSSQL_TO_SPARK
    dt = table.get(base, DEFAULT_TYPE)
    if base in ("number", "decimal", "numeric") and prec is not None:
        p = min(int(prec), 38)
        sc = max(int(scale or 0), 0)
        if sc == 0 and base == "number":
            # integer-valued NUMBER: narrowest integral type that HOLDS the
            # declared precision — NUMBER(<=9) fits int32, NUMBER(<=18)
            # fits int64; wider (19-38 digits) must stay DECIMAL(p,0), a
            # long would overflow (NUMBER(20) max is 10^20-1 > 2^63-1).
            if p <= 9:
                return T.IntegerType()
            if p <= 18:
                return T.LongType()
            return T.DecimalType(p, 0)
        return T.DecimalType(p, min(sc, p))
    return dt


def build_struct_type(
    columns: list[tuple[str, str, bool]], dialect: str = "oracle"
) -> T.StructType:
    """Build a StructType from reflected ``(name, source_type, nullable)``
    tuples — the Spark analogue of the reference's DDL-from-catalog step
    (ingest_ecollision_oracle_data.py:16-46)."""
    return T.StructType(
        [
            T.StructField(name.lower(), map_source_type(src_type, dialect), bool(nullable))
            for name, src_type, nullable in columns
        ]
    )


def generate_create_table_ddl(
    table: str,
    schema: T.StructType,
    *,
    if_not_exists: bool = True,
    using: str = "parquet",
    extra_columns: dict[str, str] | None = None,
    comment: str | None = None,
    primary_key: str | None = None,
    foreign_keys: list[tuple[str, str, str]] | None = None,
) -> str:
    """S9: emit Spark SQL ``CREATE TABLE`` DDL from a StructType.

    ``extra_columns`` reproduces the fusion tables' lineage column — every
    fusion table gets ``SOURCE TEXT`` appended
    (create_empty_tables_for_ecollision_fusion.py:32).
    The reference's idempotency guards (`IF NOT EXISTS` emulation via
    ``DO $$`` blocks, ingest_ecollision_analytics_data.py:33-40) become the
    native ``IF NOT EXISTS`` clause.

    ``primary_key`` / ``foreign_keys`` reproduce the reference's
    constraint-carrying DDL (PK/FK clauses generated from Oracle
    user_constraints, ingest_ecollision_oracle_data.py:29-41).  Spark SQL
    cannot *enforce* either, so they are emitted as TBLPROPERTIES metadata —
    discoverable by downstream tooling, semantically documented, never
    silently dropped.  ``foreign_keys`` entries are
    (column, ref_table, ref_column).
    """
    cols = [
        f"  {f.name} {f.dataType.simpleString().upper()}{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    ]
    for name, sql_type in (extra_columns or {}).items():
        cols.append(f"  {name} {sql_type}")
    ine = "IF NOT EXISTS " if if_not_exists else ""
    ddl = f"CREATE TABLE {ine}{table} (\n" + ",\n".join(cols) + f"\n) USING {using}"
    props: list[tuple[str, str]] = []
    if primary_key:
        props.append(("constraints.primary_key", primary_key))
    for i, (col, ref_table, ref_col) in enumerate(foreign_keys or []):
        props.append((f"constraints.foreign_key.{i}", f"{col} REFERENCES {ref_table}({ref_col})"))
    if props:
        ddl += (
            " TBLPROPERTIES (\n"
            + ",\n".join(f"  '{k}' = '{v}'" for k, v in props)
            + "\n)"
        )
    if comment:
        ddl += f" COMMENT '{comment}'"
    return ddl


def generate_create_table_ddl_for(
    table: str, schema: T.StructType, **kwargs
) -> str:
    """Convenience flavor that pulls PK/FK metadata from the catalog's
    constraint registries (catalog.PRIMARY_KEYS / catalog.FOREIGN_KEYS) —
    the path the fusion ETL uses so generated DDL always carries the
    declared constraints."""
    from .catalog import FOREIGN_KEYS, PRIMARY_KEYS

    return generate_create_table_ddl(
        table,
        schema,
        primary_key=PRIMARY_KEYS.get(table),
        foreign_keys=FOREIGN_KEYS.get(table),
        **kwargs,
    )


def generate_drop_table_ddl(table: str) -> str:
    """S10: ``DROP TABLE IF EXISTS`` (reference: drop+CASCADE at
    ingest_ecollision_oracle_data.py:86-89)."""
    return f"DROP TABLE IF EXISTS {table}"

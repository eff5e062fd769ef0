"""Live catalog introspection: build the TableRegistry from the source's
own system catalog at job start, the way every real deployment begins
(reference: MySQLStreamer.java:334-457 via DatabaseMetaData.getTables/
getColumns, PostgresStreamer.java:187-306, OracleStreamer.java:176-316).

Spark-first shape: JDBC's ``DatabaseMetaData`` IS just queries over the
system catalog, so the introspection runs as ``spark.read.jdbc`` pushdown
SELECTs against ``information_schema`` (MySQL/Postgres) or
``ALL_TABLES``/``ALL_TAB_COLUMNS`` (Oracle) — one small driver-side read
per database, no extra client library.

No database ships in this container, so the network-facing reader is
gated behind the same pattern as sources/jdbc.py: ``JdbcCatalogReader``
builds the exact pushdown queries (unit-tested as strings) and
``DataFrameCatalogReader`` serves the same rows from any DataFrame
(parquet/fixture stand-in), so the full catalog→registry→pipeline path is
exercised end-to-end in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from flink_cdc_multi_spark.catalog import (
    TableRegistry,
    mysql_to_spark,
    oracle_to_spark,
)
from flink_cdc_multi_spark.functions.sanitizer import sanitize

# System databases the wildcard never expands into (Debezium's default
# excludes; the reference relies on explicit database.name so it never
# scans these — a `db.*` list here must not either).
SYSTEM_DATABASES = {
    "information_schema",
    "performance_schema",
    "mysql",
    "sys",
    "pg_catalog",
    "SYS",
    "SYSTEM",
}


def table_list_query(source_type: str, db: str) -> str:
    """Pushdown SELECT that lists the base tables of one database —
    the getTables(db, null, '%', ['TABLE']) equivalent
    (MySQLStreamer.java:356-359)."""
    if source_type in ("mysql", "postgres"):
        return (
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{db}' AND table_type = 'BASE TABLE'"
        )
    if source_type == "oracle":
        return f"SELECT table_name FROM ALL_TABLES WHERE owner = '{db}'"
    raise ValueError(f"no catalog introspection for source type: {source_type}")


def column_list_query(source_type: str, db: str, table: str) -> str:
    """Pushdown SELECT for (column_name, type_name) in declared order — the
    getColumns equivalent (MySQLStreamer.java:413-440). MySQL uses
    column_type (keeps the UNSIGNED suffix the type map needs); Postgres
    data_type; Oracle ALL_TAB_COLUMNS."""
    if source_type == "mysql":
        return (
            "SELECT column_name, column_type AS type_name "
            "FROM information_schema.columns "
            f"WHERE table_schema = '{db}' AND table_name = '{table}' "
            "ORDER BY ordinal_position"
        )
    if source_type == "postgres":
        return (
            "SELECT column_name, data_type AS type_name "
            "FROM information_schema.columns "
            f"WHERE table_schema = '{db}' AND table_name = '{table}' "
            "ORDER BY ordinal_position"
        )
    if source_type == "oracle":
        return (
            "SELECT column_name, data_type AS type_name FROM ALL_TAB_COLUMNS "
            f"WHERE owner = '{db}' AND table_name = '{table}' "
            "ORDER BY column_id"
        )
    raise ValueError(f"no catalog introspection for source type: {source_type}")


@dataclass
class JdbcCatalogReader:
    """Live reader: each call is one spark.read.jdbc pushdown SELECT.
    The catalog result sets are tiny (table/column lists), so these are
    single-partition driver-adjacent reads — the data-plane snapshot reads
    (sources/jdbc.py) are the ones that parallelize."""

    spark: SparkSession
    source_type: str
    url: str
    user: str
    password: str

    def _query(self, q: str) -> DataFrame:
        return (
            self.spark.read.format("jdbc")
            .options(
                url=self.url,
                user=self.user,
                password=self.password,
                dbtable=f"({q}) c",
            )
            .load()
        )

    def tables(self, db: str) -> list[str]:
        rows = self._query(table_list_query(self.source_type, db)).collect()
        return [r[0] for r in rows]

    def columns(self, db: str, table: str) -> list[tuple[str, str]]:
        rows = self._query(column_list_query(self.source_type, db, table)).collect()
        return [(r[0], r[1]) for r in rows]


@dataclass
class DataFrameCatalogReader:
    """Fixture stand-in: serves the same (table_schema, table_name,
    column_name, type_name, ordinal_position) rows from any DataFrame —
    exactly what a parquet dump of information_schema.columns looks like."""

    columns_df: DataFrame

    def tables(self, db: str) -> list[str]:
        rows = (
            self.columns_df.filter(f"table_schema = '{db}'")
            .select("table_name")
            .distinct()
            .collect()
        )
        return sorted(r[0] for r in rows)

    def columns(self, db: str, table: str) -> list[tuple[str, str]]:
        rows = (
            self.columns_df.filter(
                f"table_schema = '{db}' AND table_name = '{table}'"
            )
            .orderBy("ordinal_position")
            .collect()
        )
        return [(r["column_name"], r["type_name"]) for r in rows]


def introspect_schema(
    source_type: str,
    reader,
    db: str,
    table: str,
    schema_mode: str = "compat",
) -> T.StructType:
    """One table's payload StructType from its catalog columns: sanitize
    names (warn-on-change is the reference's behavior — here the sanitized
    name simply IS the schema), apply the source type map, always nullable
    (MySQLStreamer.java:430)."""
    to_spark = oracle_to_spark if source_type == "oracle" else mysql_to_spark
    fields = [
        T.StructField(sanitize(col), to_spark(type_name, schema_mode), True)
        for col, type_name in reader.columns(db, table)
    ]
    if not fields:
        raise ValueError(f"catalog has no columns for {db}.{table}")
    return T.StructType(fields)


def build_registry_from_catalog(
    source_type: str,
    reader,
    table_list: list[str],
    schema_mode: str = "compat",
    **registry_kwargs,
) -> TableRegistry:
    """``db.*``/``db.table`` config entries + a catalog reader → the full
    TableRegistry, no hand-built schema dict (the reference's
    createTagSchemaMapForDatabase flow, MySQLStreamer.java:334-457; DDL
    tables are appended per db by TableRegistry.build).

    Wildcards expand against the live table list of that database;
    system databases never match a wildcard.
    """
    tables: dict[tuple[str, str], T.StructType] = {}
    for entry in table_list:
        db, _, tbl = entry.partition(".")
        if tbl == "*":
            if db in SYSTEM_DATABASES:
                raise ValueError(f"refusing wildcard over system database {db}")
            expanded = [(db, t) for t in reader.tables(db)]
        else:
            expanded = [(db, tbl)]
        for d, t in expanded:
            if (d, t) not in tables:
                tables[(d, t)] = introspect_schema(
                    source_type, reader, d, t, schema_mode
                )
    return TableRegistry.build(source_type, tables, **registry_kwargs)

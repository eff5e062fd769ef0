"""Catalog introspection: information_schema/ALL_TAB_COLUMNS → TableRegistry
(MySQLStreamer.java:334-457 flow) with a fixture catalog reader."""

import pytest
from pyspark.sql import types as T

from conftest import make_mysql_row

from flink_cdc_multi_spark.sources.introspect import (
    DataFrameCatalogReader,
    build_registry_from_catalog,
    column_list_query,
    table_list_query,
)

CATALOG_COLS = "table_schema string, table_name string, column_name string, type_name string, ordinal_position int"


def _catalog_df(spark):
    rows = [
        ("shopdb", "users", "id", "bigint(20)", 1),
        ("shopdb", "users", "name", "varchar(255)", 2),
        ("shopdb", "users", "balance", "decimal(10,2)", 3),
        ("shopdb", "users", "visits", "int(10) unsigned", 4),
        ("shopdb", "users", "created_at", "datetime", 5),
        ("shopdb", "orders", "id", "bigint(20)", 1),
        ("shopdb", "orders", "amount", "double", 2),
        ("otherdb", "logs", "id", "int(11)", 1),
    ]
    return spark.createDataFrame(rows, CATALOG_COLS)


def test_query_construction():
    assert "information_schema.tables" in table_list_query("mysql", "shopdb")
    assert "BASE TABLE" in table_list_query("postgres", "pg")
    assert "ALL_TABLES" in table_list_query("oracle", "APP")
    # MySQL must read column_type (keeps UNSIGNED for the long promotion)
    assert "column_type" in column_list_query("mysql", "shopdb", "users")
    assert "data_type" in column_list_query("postgres", "pg", "t")
    assert "ALL_TAB_COLUMNS" in column_list_query("oracle", "APP", "T")
    assert "ORDER BY ordinal_position" in column_list_query("mysql", "d", "t")


def test_wildcard_registry_from_catalog(spark):
    reader = DataFrameCatalogReader(_catalog_df(spark))
    reg = build_registry_from_catalog("mysql", reader, ["shopdb.*"])
    # wildcard expands to this db's tables only, plus the per-db DDL table
    assert set(reg.specs) == {"shopdb.users", "shopdb.orders", "shopdb._shopdb_ddl"}
    users = reg.specs["shopdb.users"].payload_schema
    assert dict((f.name, f.dataType) for f in users.fields) == {
        "id": T.LongType(),
        "name": T.StringType(),
        "balance": T.StringType(),  # compat: DECIMAL → string
        "visits": T.LongType(),  # int unsigned → long
        "created_at": T.LongType(),  # compat: DATETIME → epoch long
    }
    assert all(f.nullable for f in users.fields)  # NULL always allowed


def test_explicit_plus_wildcard_and_typed_mode(spark):
    reader = DataFrameCatalogReader(_catalog_df(spark))
    reg = build_registry_from_catalog(
        "mysql", reader, ["otherdb.logs", "shopdb.users"], schema_mode="typed"
    )
    assert "otherdb.logs" in reg.specs and "shopdb.users" in reg.specs
    typed = dict(
        (f.name, f.dataType)
        for f in reg.specs["shopdb.users"].payload_schema.fields
    )
    assert typed["balance"] == T.DecimalType(38, 18)
    assert typed["created_at"] == T.TimestampType()


def test_system_db_wildcard_refused(spark):
    reader = DataFrameCatalogReader(_catalog_df(spark))
    with pytest.raises(ValueError, match="system database"):
        build_registry_from_catalog("mysql", reader, ["mysql.*"])


def test_missing_table_fails(spark):
    reader = DataFrameCatalogReader(_catalog_df(spark))
    with pytest.raises(ValueError, match="no columns"):
        build_registry_from_catalog("mysql", reader, ["shopdb.ghost"])


def test_e2e_stream_from_wildcard_config(spark, tmp_path):
    """The VERDICT's 'first thing every real user needs': start a pipeline
    from a db.* config with NO hand-built schema dict — registry comes from
    the catalog reader — and route a live feed through it."""
    from flink_cdc_multi_spark.config import JobConfig
    from flink_cdc_multi_spark.streaming.pipeline import CDCPipeline

    reader = DataFrameCatalogReader(_catalog_df(spark))
    cfg = JobConfig.from_dict(
        {
            "source.id": "s1",
            "source.type": "mysql",
            "source.table.list": "shopdb.*",
            "sink.path": str(tmp_path / "sink"),
            "offset.store.path": str(tmp_path / "store"),
            "checkpoint.interval": 1,
        }
    )
    reg = build_registry_from_catalog("mysql", reader, cfg.source_table_list)
    pipe = CDCPipeline(cfg, reg)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    lines = [
        make_mysql_row(
            db="shopdb",
            table="users",
            op="c",
            after={"id": 1, "name": "a", "visits": 5},
            pos=10,
        ),
        make_mysql_row(
            db="shopdb", table="orders", op="c", after={"id": 7, "amount": 3.5}, pos=20
        ),
    ]
    (feed_dir / "f1.json").write_text("\n".join(lines) + "\n")
    query = pipe.start(spark, str(feed_dir), str(tmp_path / "ckpt"))
    query.processAllAvailable()
    query.stop()
    users = spark.read.parquet(str(tmp_path / "sink" / "s1_shopdb__users"))
    assert users.count() == 1
    assert users.first()["visits"] == 5
    orders = spark.read.parquet(str(tmp_path / "sink" / "s1_shopdb__orders"))
    assert orders.first()["amount"] == 3.5

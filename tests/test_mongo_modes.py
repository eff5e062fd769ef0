"""Mongo deserialization modes + drift matrix (FIXTURES.md §B4)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_multi_spark.sources.mongo import (
    SchemaDriftError,
    check_extra_fields,
    normalize_mongo_id,
    project_mongo_payload,
)

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
        T.StructField("d", T.BooleanType()),
    ]
)


def _df(spark, payloads):
    return spark.createDataFrame(
        [(i, json.dumps(p)) for i, p in enumerate(payloads)], "rid long, payload string"
    )


def test_top_level_type(spark):
    df = _df(spark, [{"a": 1, "b": "x", "c": 1.5, "d": True}])
    out = project_mongo_payload(df, "payload", SCHEMA, "top-level-type").first()
    assert (out["a"], out["b"], out["c"], out["d"]) == (1, "x", 1.5, True)
    assert isinstance(out["a"], int) and isinstance(out["c"], float)


def test_missing_fields_null_filled(spark):
    df = _df(spark, [{"a": 7}])  # b, c, d missing
    out = project_mongo_payload(df, "payload", SCHEMA, "top-level-type").first()
    assert out["a"] == 7
    assert out["b"] is None and out["c"] is None and out["d"] is None


def test_extra_field_hard_fails(spark):
    df = _df(spark, [{"a": 1, "zz_new": 5}])
    assert check_extra_fields(df, "payload", SCHEMA) == ["zz_new"]
    with pytest.raises(SchemaDriftError, match="version the"):
        project_mongo_payload(df, "payload", SCHEMA, "top-level-type")
    # skip policy
    out = project_mongo_payload(df, "payload", SCHEMA, "top-level-type",
                                fail_on_extra=False).first()
    assert out["a"] == 1


def test_top_level_string_mode(spark):
    df = _df(spark, [{"a": 1, "b": "x", "c": 1.5, "d": True}])
    out = project_mongo_payload(df, "payload", SCHEMA, "top-level-string").first()
    assert out["a"] == "1" and out["c"] == "1.5"
    assert out["d"] in ("true", "True")


def test_doc_string_mode(spark):
    df = _df(spark, [{"_id": "abc", "a": 1, "b": "x"}])
    out = project_mongo_payload(df, "payload", SCHEMA, "doc-string").first()
    doc = json.loads(out["doc"])
    assert "_id" not in doc
    assert doc == {"a": 1, "b": "x"}


def test_extended_json_unwrap(spark):
    df = _df(
        spark,
        [
            {
                "a": {"$numberLong": "9007199254740993"},
                "b": {"$oid": "65f0aabbccddeeff00112233"},
                "c": {"$numberDouble": "2.5"},
                "d": True,
            }
        ],
    )
    out = project_mongo_payload(df, "payload", SCHEMA, "top-level-type").first()
    assert out["a"] == 9007199254740993
    assert out["b"] == "65f0aabbccddeeff00112233"
    assert out["c"] == 2.5


def test_id_normalization(spark):
    df = _df(spark, [{"_id": {"$oid": "65f0"}}, {"_id": "plain"}, {"_id": 42}])
    got = [r["i"] for r in df.select(normalize_mongo_id(F.col("payload")).alias("i")).collect()]
    assert got == ["65f0", "plain", "42"]


def test_type_mismatch_hard_fails(spark):
    """Drift contract, type axis: a value that no longer fits the pinned
    field type must FAIL the batch loudly (ANSI cast), not silently
    null-fill — changed types are schema drift exactly like extra
    fields, and the operator re-versions the collection. (Missing fields
    null-fill; extra fields hard-fail; changed types hard-fail.)"""
    df = _df(spark, [{"a": "not-a-number"}])
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
        project_mongo_payload(df, "payload", SCHEMA, "top-level-type").collect()


def test_system_db_refused():
    """The reference refuses to stream MongoDB system databases
    (MongoDBStreamer.java:74-79, case-insensitive regex admin|config|local);
    mirror the guard at config validation and as a reusable check."""
    from flink_cdc_multi_spark.config import ConfigError, JobConfig
    from flink_cdc_multi_spark.sources.mongo import ensure_not_system_db

    for db in ("admin", "config", "local", "Admin", "LOCAL", "CONFIG"):
        with pytest.raises(ValueError, match="CANNOT STREAM FROM SYSTEM DB"):
            ensure_not_system_db(db)
    # near-misses pass through unchanged
    for db in ("admin2", "my-db", "localdata", "configs"):
        assert ensure_not_system_db(db) == db

    base = {"source.id": "m1", "source.type": "mongodb", "sink.path": "/tmp/x"}
    for key, val in (
        ("source.database.name", "admin"),
        ("source.database.list", "good,config"),
        ("source.collection.list", "local.oplog"),
    ):
        with pytest.raises(ConfigError, match="CANNOT STREAM FROM SYSTEM DB"):
            JobConfig.from_dict({**base, key: val})
    # a normal db with an authSource=admin connection option is fine
    ok = JobConfig.from_dict(
        {**base, "source.database.name": "my-db", "source.collection.list": "my-db.c1"}
    )
    assert ok.source_table_list == ["my-db.c1"]

"""Kafka value-decoding transform (stand-in frame shaped like Kafka's
output — the integration jar is absent in this container)."""

from conftest import make_mysql_row

from flink_cdc_multi_spark.sources.kafka import kafka_values_to_envelope


def test_kafka_values_decode_and_retain_offsets(spark):
    rows = [
        (make_mysql_row(op="c", after={"id": 1, "v": "a"}, pos=10).encode(),
         "cdc.testdb.users", 0, 100),
        (make_mysql_row(op="u", before={"id": 1, "v": "a"},
                        after={"id": 1, "v": "b"}, pos=20).encode(),
         "cdc.testdb.users", 0, 101),
    ]
    kafka_like = spark.createDataFrame(
        rows, "value binary, topic string, partition int, offset long"
    )
    env = kafka_values_to_envelope(kafka_like, "mysql").orderBy("_kafka_offset")
    got = env.collect()
    assert [r["_op"] for r in got] == ["INSERT", "UPDATE"]
    assert [r["_kafka_offset"] for r in got] == [100, 101]
    assert got[0]["_db"] == "testdb" and got[0]["_tbl"] == "users"


def test_standin_rejects_zero_trigger(spark, tmp_path):
    """An explicit max_files_per_trigger=0 is a caller bug — rejected
    loudly (consistent with CDCPipeline.start), never silently treated as
    'unbounded trigger' (ADVICE r5)."""
    import pytest

    from flink_cdc_multi_spark.sources.kafka import read_kafka_stream_standin

    with pytest.raises(ValueError, match="max_files_per_trigger"):
        read_kafka_stream_standin(spark, str(tmp_path), "mysql", max_files_per_trigger=0)

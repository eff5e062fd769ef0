"""startup.mode=timestamp repositioning (MySQLStreamer.java:240-251)."""

from pyspark.sql import types as T

from conftest import make_mysql_row

from flink_cdc_multi_spark.catalog import TableRegistry
from flink_cdc_multi_spark.config import JobConfig
from flink_cdc_multi_spark.streaming.pipeline import CDCPipeline

USERS = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def test_timestamp_startup_skips_earlier_events(spark, tmp_path):
    cfg = JobConfig.from_dict(
        {
            "source.id": "s1",
            "source.type": "mysql",
            "sink.path": str(tmp_path / "sink"),
            "checkpoint.interval": 1,
            "startup.mode": "timestamp",
            "datetime.offset": "2024-01-01T00:00:00",  # = 1704067200000 ms UTC
        }
    )
    pipe = CDCPipeline(cfg, TableRegistry.build("mysql", {("testdb", "users"): USERS}))
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "f.json").write_text(
        "\n".join(
            [
                make_mysql_row(op="c", after={"id": 1, "v": "old"}, pos=10,
                               ts_ms=1703980800000),  # 2023-12-31
                make_mysql_row(op="c", after={"id": 2, "v": "new"}, pos=20,
                               ts_ms=1704070800000),  # 2024-01-01 01:00
            ]
        )
        + "\n"
    )
    query = pipe.start(spark, str(feed), str(tmp_path / "ckpt"))
    query.processAllAvailable()
    query.stop()
    users = spark.read.parquet(str(tmp_path / "sink" / "s1_testdb__users"))
    assert [r["id"] for r in users.collect()] == [2]


def test_oracle_startup_degrades_and_pg_timestamp_rejected(spark, tmp_path):
    import pytest as _pytest

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "empty.json").write_text("")
    for src, mode, should_raise in [
        ("oracle", "earliest", False),
        ("postgres", "timestamp", True),
    ]:
        cfg = JobConfig.from_dict(
            {
                "source.id": "s",
                "source.type": src,
                "sink.path": str(tmp_path / "sink"),
                "startup.mode": mode,
                "checkpoint.interval": 1,
            }
        )
        pipe = CDCPipeline(cfg, TableRegistry.build(src, {("d", "t"): USERS}))
        if should_raise:
            with _pytest.raises(ValueError, match="timestamp"):
                pipe.start(spark, str(feed), str(tmp_path / f"ck_{src}"))
        else:
            q = pipe.start(spark, str(feed), str(tmp_path / f"ck_{src}"))
            assert cfg.startup_mode == "initial"  # degraded with warning
            q.stop()

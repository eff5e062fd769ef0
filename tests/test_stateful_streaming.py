"""applyInPandasWithState operator: per-key running status across
micro-batches (state survives between triggers)."""

from conftest import make_mysql_row

from flink_cdc_multi_spark.sources.debezium_json import decode_raw
from flink_cdc_multi_spark.streaming.stateful import running_status_by_key


def test_running_status_state_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "f1.json").write_text(
        "\n".join(
            [
                make_mysql_row(op="c", after={"id": 1}, pos=10, ts_ms=1000),
                make_mysql_row(op="c", after={"id": 2}, pos=20, ts_ms=2000),
            ]
        )
    )
    stream = decode_raw(
        spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(str(feed)),
        "mysql",
    )
    status = running_status_by_key(stream, "_tbl", "_binlog_pos_end")
    q = (
        status.writeStream.format("memory")
        .queryName("running_status")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    first = {r["key"]: r for r in spark.sql("SELECT * FROM running_status").collect()}
    assert first["users"]["record_count"] == 2
    assert first["users"]["max_offset"] == 20

    # second batch: state must ACCUMULATE (3 total), not restart
    (feed / "f2.json").write_text(
        make_mysql_row(op="u", before={"id": 1}, after={"id": 1}, pos=30, ts_ms=3000)
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM running_status WHERE record_count = 3"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["max_offset"] == 30
    assert rows[0]["last_ts"] == 3000

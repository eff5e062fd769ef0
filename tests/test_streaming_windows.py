"""Watermarked windowed aggregations (streaming/windows.py): tumbling
windows finalize in append mode once the watermark passes, events later
than the watermark are DROPPED (bounded state), and session windows merge
gap-extended intervals."""

from conftest import make_mysql_row

from flink_cdc_multi_spark.sources.debezium_json import decode_raw
from flink_cdc_multi_spark.streaming.windows import (
    session_change_bursts,
    windowed_table_counts,
)

SEC = 1000
MIN = 60 * SEC


def _stream(spark, feed):
    return decode_raw(
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(feed)),
        "mysql",
    )


def test_tumbling_window_finalizes_and_drops_late(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # batch 1: two events in window [0, 60s) + one at 300s that will advance
    # the watermark to 300s - 2min = 180s after the batch commits
    (feed / "f1.json").write_text(
        "\n".join(
            [
                make_mysql_row(op="c", after={"id": 1}, pos=10, ts_ms=10 * SEC),
                make_mysql_row(op="u", before={"id": 1}, after={"id": 1}, pos=20,
                               ts_ms=20 * SEC),
                make_mysql_row(op="c", after={"id": 2}, pos=30, ts_ms=5 * MIN),
            ]
        )
    )
    win = windowed_table_counts(_stream(spark, feed), "1 minute", "2 minutes")
    q = (
        win.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # batch 2: a LATE event for the closed window (30s < watermark 180s →
    # dropped) plus a fresh event keeping the stream moving
    (feed / "f2.json").write_text(
        "\n".join(
            [
                make_mysql_row(op="c", after={"id": 3}, pos=40, ts_ms=30 * SEC),
                make_mysql_row(op="c", after={"id": 4}, pos=50, ts_ms=6 * MIN),
            ]
        )
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    # exactly the [0, 60s) window finalized; the late event did NOT count
    assert len(rows) == 1
    r = rows[0]
    assert (r["win_start"].timestamp(), r["win_end"].timestamp()) == (0.0, 60.0)
    assert (r["_db"], r["_tbl"]) == ("testdb", "users")
    assert (r["n"], r["n_insert"], r["n_update"], r["n_delete"]) == (2, 1, 1, 0)
    assert r["max_ts"] == 20 * SEC


def test_session_window_bursts(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # burst: 0s, 10s, 20s with 30s gap → session [0, 50s); the 400s event
    # advances the watermark past the session end on the next batch
    (feed / "f1.json").write_text(
        "\n".join(
            [
                make_mysql_row(op="c", after={"id": 1}, pos=10, ts_ms=0 * SEC + 1),
                make_mysql_row(op="c", after={"id": 2}, pos=20, ts_ms=10 * SEC),
                make_mysql_row(op="c", after={"id": 3}, pos=30, ts_ms=20 * SEC),
                make_mysql_row(op="c", after={"id": 4}, pos=40, ts_ms=400 * SEC),
            ]
        )
    )
    burst = session_change_bursts(_stream(spark, feed), "30 seconds", "2 minutes")
    q = (
        burst.writeStream.format("memory")
        .queryName("bursts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    (feed / "f2.json").write_text(
        make_mysql_row(op="c", after={"id": 5}, pos=50, ts_ms=800 * SEC)
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        (r["burst_start"].timestamp(), r["burst_end"].timestamp()): r
        for r in spark.sql("SELECT * FROM bursts").collect()
    }
    # the 3-event burst closed (watermark 400s-2min=280s > 50s end)
    burst_row = rows[(0.001, 50.0)]
    assert burst_row["n"] == 3
    assert burst_row["first_ts"] == 1 and burst_row["last_ts"] == 20 * SEC

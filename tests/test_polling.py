"""Polling incremental mode (sources/polling.py — VERDICT r10 item 2, the
no-Debezium live path): watermark filter semantics, insert/update
classification, filter pushdown, and the e2e contract — a second poll picks
up ONLY new/changed rows and a fresh process resumes from the offset file.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_multi_spark.config import JobConfig
from flink_cdc_multi_spark.catalog import TableRegistry
from flink_cdc_multi_spark.sources.polling import (
    PollingSource,
    TableWatermark,
    delta_filter,
    delta_to_envelope,
    observe_watermark,
    run_polling,
)
from flink_cdc_multi_spark.streaming.pipeline import CDCPipeline

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(s):
    from datetime import datetime, timezone

    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


BASE = [
    (1, _ts("2024-01-01 10:00:00"), "a"),
    (2, _ts("2024-01-01 11:00:00"), "b"),
    (3, _ts("2024-01-01 12:00:00"), "c"),
]


# -- watermark filter semantics ---------------------------------------------


def test_delta_filter_timestamp_incrementing_lexicographic(spark):
    df = _rows(spark, BASE + [(4, _ts("2024-01-01 12:00:00"), "d")])
    wm = TableWatermark(ts="2024-01-01 12:00:00", ts_type="timestamp", pk=3)
    # same-timestamp tie: only pk 4 (pk > 3 at the equal ts) passes
    got = delta_filter(df, "updated_at", "id", wm).collect()
    assert [r["id"] for r in got] == [4]
    # advanced timestamp passes regardless of pk (an UPDATE to pk 1)
    upd = _rows(spark, [(1, _ts("2024-01-01 13:00:00"), "a2")])
    got = delta_filter(upd, "updated_at", "id", wm).collect()
    assert [r["id"] for r in got] == [1]


def test_delta_filter_incrementing_only(spark):
    df = _rows(spark, BASE)
    got = delta_filter(df, None, "id", TableWatermark(pk=1)).collect()
    assert sorted(r["id"] for r in got) == [2, 3]
    # empty watermark = full backfill
    assert delta_filter(df, None, "id", TableWatermark()).count() == 3


def test_delta_filter_timestamp_only(spark):
    df = _rows(spark, BASE)
    wm = TableWatermark(ts="2024-01-01 11:00:00", ts_type="timestamp")
    got = delta_filter(df, "updated_at", None, wm).collect()
    assert [r["id"] for r in got] == [3]


def test_observe_watermark_monotone_merge(spark):
    df = _rows(spark, BASE)
    wm = observe_watermark(df, "updated_at", "id", TableWatermark())
    assert wm.pk == 3 and wm.ts.startswith("2024-01-01 12:00:00")
    # a LOWER batch never regresses the mark
    low = _rows(spark, [(2, _ts("2024-01-01 09:00:00"), "x")])
    wm2 = observe_watermark(low, "updated_at", "id", wm)
    assert (wm2.ts, wm2.pk) == (wm.ts, wm.pk)
    # empty batch keeps it
    wm3 = observe_watermark(df.limit(0), "updated_at", "id", wm)
    assert (wm3.ts, wm3.pk) == (wm.ts, wm.pk)


def test_delta_filter_pushes_down_to_scan(spark, tmp_path):
    """The watermark predicate must reach the scan (on JDBC it becomes the
    remote WHERE; parquet shows the same contract as PushedFilters)."""
    import io
    from contextlib import redirect_stdout

    p = str(tmp_path / "t")
    _rows(spark, BASE).write.parquet(p)
    wm = TableWatermark(ts="2024-01-01 11:00:00", ts_type="timestamp", pk=2)
    df = delta_filter(spark.read.parquet(p), "updated_at", "id", wm)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan
    assert "updated_at" in plan.split("PushedFilters:")[1].split("]")[0]


def test_delta_to_envelope_op_classification(spark):
    delta = _rows(
        spark,
        [(2, _ts("2024-01-01 14:00:00"), "b2"), (5, _ts("2024-01-01 14:00:00"), "e")],
    )
    env = delta_to_envelope(delta, "shop", "users", "id", 3, 1700000000000)
    ops = {json.loads(r["payload"])["id"]: r["_op"] for r in env.collect()}
    assert ops == {2: "UPDATE", 5: "INSERT"}
    assert env.columns == [
        "_db", "_tbl", "_database", "_op", "_ts", "_ddl", "_ddl_tbl",
        "payload", "_snapshotting", "_binlog_file", "_binlog_pos_end",
        "_binlog_file_internal", "_binlog_pos_internal",
    ]


def test_polling_source_requires_a_watermark_column():
    with pytest.raises(ValueError, match="polling.key.column"):
        PollingSource([("db", "t")], None, None)


# -- e2e: snapshot, delta pickup, offset-file resume -------------------------


def _write_standin(spark, path, rows):
    _rows(spark, rows).write.mode("overwrite").parquet(path)


def _cfg(tmp_path, **extra):
    d = {
        "source.id": "poll1",
        "source.type": "mysql",
        "sink.path": str(tmp_path / "sink"),
        "offset.store.path": str(tmp_path / "offsets"),
        "source.table.list": "shop.users",
        "incremental.mode": "polling",
        "polling.watermark.column": "updated_at",
        "polling.key.column": "id",
        "polling.standin.path": str(tmp_path / "live"),
        "polling.interval.s": 0,
    }
    d.update(extra)
    return JobConfig.from_dict(d)


def _pipeline(cfg):
    reg = TableRegistry.build("mysql", {("shop", "users"): SCHEMA})
    return CDCPipeline(cfg, reg)


def test_polling_e2e_snapshot_then_delta_then_resume(spark, tmp_path):
    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    cfg = _cfg(tmp_path)

    # phase 1: initial startup = full snapshot (READ rows) + watermark seed
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert out.count() == 3
    assert {r["_op"] for r in out.collect()} == {"READ"}
    state = json.loads(open(str(tmp_path / "offsets" / "poll1_polling.json")).read())
    assert state["shop.users"]["pk"] == 3

    # phase 2: the live table gains a row and an update; a FRESH process
    # (new PollingSource, offsets from the file) picks up ONLY those two
    _write_standin(
        spark,
        live,
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),      # untouched
            (2, _ts("2024-01-02 09:00:00"), "b2"),     # updated
            (3, _ts("2024-01-01 12:00:00"), "c"),      # untouched
            (4, _ts("2024-01-02 10:00:00"), "d"),      # new
        ],
    )
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert out.count() == 5  # 3 snapshot + 2 delta
    delta_ops = {r["id"]: r["_op"] for r in out.filter("_op != 'READ'").collect()}
    assert delta_ops == {2: "UPDATE", 4: "INSERT"}

    # phase 3: nothing changed — a further poll emits nothing
    run_polling(spark, cfg, _pipeline(cfg), max_polls=2, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert out.count() == 5
    state = json.loads(open(str(tmp_path / "offsets" / "poll1_polling.json")).read())
    assert state["shop.users"]["pk"] == 4
    assert state["shop.users"]["ts"].startswith("2024-01-02 10:00:00")


def test_polling_timestamp_startup_matches_feed_end_state(spark, tmp_path):
    """startup.mode=timestamp parity across transports (r14, VERDICT r13
    item 7; MySQLStreamer.java:220-255 matrix): the SAME change history
    positioned at the SAME datetime offset through (a) the Debezium file
    feed and (b) the polling leg must materialize the SAME end state —
    rows strictly before the cut excluded by both, rows at/after it
    present with identical latest images. Ops differ by construction
    (polling can't see ops, only states), so parity is on the
    materialized (id, updated_at, v) image."""
    from conftest import make_mysql_row

    cut = "2024-01-01 11:30:00"
    history = [
        (1, _ts("2024-01-01 10:00:00"), "a"),      # before the cut
        (2, _ts("2024-01-01 11:00:00"), "b"),      # before the cut
        (3, _ts("2024-01-01 12:00:00"), "c"),      # after
        (4, _ts("2024-01-02 10:00:00"), "d"),      # after
    ]

    # (a) polling leg: live table holds the history; poll-since-datetime
    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, history)
    cfg = _cfg(tmp_path, **{"startup.mode": "timestamp",
                            "datetime.offset": cut})
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    poll_out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))

    # (b) feed leg: the same history as change events, same timestamp start
    def ev(i, ts, v):
        ms = int(ts.timestamp() * 1000)
        return make_mysql_row(
            db="shop", op="c",
            after={"id": i, "updated_at": ts.strftime("%Y-%m-%d %H:%M:%S"),
                   "v": v},
            pos=i * 10, ts_ms=ms,
        )

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    (feed_dir / "f1.json").write_text(
        "\n".join(ev(i, ts, v) for i, ts, v in history) + "\n"
    )
    feed_cfg = JobConfig.from_dict({
        "source.id": "feed1",
        "source.type": "mysql",
        "sink.path": str(tmp_path / "fsink"),
        "offset.store.path": str(tmp_path / "foffsets"),
        "startup.mode": "timestamp",
        "datetime.offset": cut,
        "checkpoint.interval": 1,
    })
    feed_pipe = CDCPipeline(
        feed_cfg, TableRegistry.build("mysql", {("shop", "users"): SCHEMA})
    )
    q = feed_pipe.start(spark, str(feed_dir), str(tmp_path / "fckpt"))
    q.processAllAvailable()
    q.stop()
    feed_out = spark.read.parquet(str(tmp_path / "fsink" / "feed1_shop__users"))

    def latest_image(df):
        return {
            r["id"]: (r["updated_at"], r["v"])
            for r in df.groupBy("id")
            .agg(F.max_by(F.struct("updated_at", "v"), "_ts").alias("s"))
            .select("id", "s.updated_at", "s.v")
            .collect()
        }

    pi, fi = latest_image(poll_out), latest_image(feed_out)
    assert pi == fi
    assert sorted(pi) == [3, 4]  # the pre-cut rows excluded by BOTH legs


def test_polling_startup_latest_skips_existing_rows(spark, tmp_path):
    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    cfg = _cfg(tmp_path, **{"startup.mode": "latest"})
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    # no snapshot, no deltas: the sink dir for the table doesn't exist yet
    import os

    assert not os.path.exists(str(tmp_path / "sink" / "poll1_shop__users"))
    # a row arriving after startup is picked up as INSERT
    _write_standin(spark, live, BASE + [(4, _ts("2024-01-03 00:00:00"), "d")])
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert [(r["id"], r["_op"]) for r in out.collect()] == [(4, "INSERT")]


def test_polling_offset_value_beats_stored_file(spark, tmp_path):
    """Reference precedence (FlinkCDCMulti.java:190-193): a configured
    offset.value re-positions the poller even when the file says later."""
    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    ov = json.dumps(
        {"shop.users": {"ts": "2024-01-01 10:30:00", "ts_type": "timestamp", "pk": 1}}
    )
    cfg = _cfg(tmp_path, **{"startup.mode": "offset", "offset.value": ov})
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


def test_polling_cli_transport(spark, tmp_path):
    """Wired through __main__: incremental.mode=polling is a transport;
    combining it with feed.path is rejected."""
    from flink_cdc_multi_spark.__main__ import main

    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    # registry via catalog.file (information_schema-shaped parquet)
    cat = str(tmp_path / "catalog")
    spark.createDataFrame(
        [
            ("shop", "users", "id", "bigint", 1),
            ("shop", "users", "updated_at", "datetime", 2),
            ("shop", "users", "v", "varchar(10)", 3),
        ],
        "table_schema string, table_name string, column_name string, "
        "type_name string, ordinal_position int",
    ).write.parquet(cat)
    cfg_path = str(tmp_path / "job.json")
    cfg = {
        "source.id": "poll1",
        "source.type": "mysql",
        "sink.path": str(tmp_path / "sink"),
        "offset.store.path": str(tmp_path / "offsets"),
        "source.table.list": "shop.users",
        "catalog.file": cat,
        "incremental.mode": "polling",
        "polling.watermark.column": "updated_at",
        "polling.key.column": "id",
        "polling.standin.path": str(tmp_path / "live"),
        "polling.interval.s": 0.01,
        "polling.max.polls": 1,
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert main(["--config", cfg_path]) == 0
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert out.count() == 3

    from flink_cdc_multi_spark.config import ConfigError

    cfg["feed.path"] = str(tmp_path / "feed")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    with pytest.raises(ConfigError, match="exactly ONE transport"):
        main(["--config", cfg_path])


def test_polling_snapshot_diff_delete_detection(spark, tmp_path):
    """polling.delete.detection=snapshot-diff (r11): a row that vanishes
    from the live table between polls emits a key-only DELETE envelope;
    the key-set epoch advances with the same at-least-once ordering as
    the watermark file, and a fresh process resumes the diff from the
    persisted epoch."""
    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    cfg = _cfg(tmp_path, **{"polling.delete.detection": "snapshot-diff"})

    # snapshot seeds epoch 0 from the snapshot itself
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    state = json.loads(open(str(tmp_path / "offsets" / "poll1_polling.json")).read())
    assert state["shop.users"]["keys_epoch"] == 0

    # row 2 deleted AND row 4 inserted; a FRESH process diffs vs epoch 0
    _write_standin(
        spark,
        live,
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (3, _ts("2024-01-01 12:00:00"), "c"),
            (4, _ts("2024-01-02 10:00:00"), "d"),
        ],
    )
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    ops = {(r["id"], r["_op"]) for r in out.filter("_op != 'READ'").collect()}
    assert (4, "INSERT") in ops
    assert (2, "DELETE") in ops
    state = json.loads(open(str(tmp_path / "offsets" / "poll1_polling.json")).read())
    assert state["shop.users"]["keys_epoch"] == 1

    # delete-only change (watermark does NOT move): row 3 vanishes
    _write_standin(
        spark,
        live,
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (4, _ts("2024-01-02 10:00:00"), "d"),
        ],
    )
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    dels = sorted(r["id"] for r in out.filter("_op = 'DELETE'").collect())
    assert dels == [2, 3]
    # quiet poll: no new rows, epoch unchanged
    n = out.count()
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    assert out.count() == n
    state = json.loads(open(str(tmp_path / "offsets" / "poll1_polling.json")).read())
    assert state["shop.users"]["keys_epoch"] == 2


def test_polling_delete_envelope_carries_last_seen_watermark(spark, tmp_path):
    """r12: epoch keysets persist (key, last-seen watermark), so a DELETE
    payload reports when the row was last observed — context for
    downstream tombstones, not just a bare key."""
    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    cfg = _cfg(tmp_path, **{"polling.delete.detection": "snapshot-diff"})
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    _write_standin(spark, live, [BASE[0], BASE[2]])  # row 2 vanishes
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    out = spark.read.parquet(str(tmp_path / "sink" / "poll1_shop__users"))
    del_rows = out.filter("_op = 'DELETE'").collect()
    assert [r["id"] for r in del_rows] == [2]
    assert del_rows[0]["updated_at"] is not None  # last-seen wm, not NULL
    assert str(del_rows[0]["updated_at"]).startswith("2024-01-01 11:00:00")


def test_polling_delete_context_columns_flow_to_tombstone(spark, tmp_path):
    """r13 (VERDICT r12 item 5): polling.keyset.context.columns opts
    extra columns into the epoch keyset, so a DELETE envelope carries the
    row's LAST-OBSERVED values for them — and a downstream compact_table
    tombstone (drop_deletes=False) keeps that context. Also pins the
    config gate: the epoch parquet schema is exactly key + wm + context,
    and without the config the context column stays out (NULL payload)."""
    from flink_cdc_multi_spark.operators.cdc import compact_table

    live = str(tmp_path / "live" / "shop.users")
    _write_standin(spark, live, BASE)
    cfg = _cfg(tmp_path, **{
        "polling.delete.detection": "snapshot-diff",
        "polling.keyset.context.columns": "v",
    })
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    # config-gated epoch schema: key + watermark + context column
    ep0 = spark.read.parquet(
        str(tmp_path / "offsets" / "poll1_keysets" / "shop.users" / "epoch=0")
    )
    assert sorted(ep0.columns) == ["id", "updated_at", "v"]

    _write_standin(spark, live, [BASE[0], BASE[2]])  # row 2 vanishes
    run_polling(spark, cfg, _pipeline(cfg), max_polls=1, interval_s=0)
    sink = str(tmp_path / "sink" / "poll1_shop__users")
    out = spark.read.parquet(sink)
    del_rows = out.filter("_op = 'DELETE'").collect()
    assert [r["id"] for r in del_rows] == [2]
    assert del_rows[0]["v"] == "b"  # last-observed value, not NULL
    assert str(del_rows[0]["updated_at"]).startswith("2024-01-01 11:00:00")

    # the tombstone keeps the context through materialization
    compact_table(spark, sink, ["id"], ["_ts"], drop_deletes=False)
    state = spark.read.parquet(sink)
    tomb = state.filter("_op = 'DELETE'").collect()
    assert [(r["id"], r["v"]) for r in tomb] == [(2, "b")]
    live_ids = sorted(r["id"] for r in state.filter("_op != 'DELETE'").collect())
    assert live_ids == [1, 3]


def test_polling_ghost_row_delete_not_lost(spark, tmp_path):
    """ADVICE r11 ghost-row fix: a row that appears in the DELTA scan but
    is deleted before the same poll's KEY scan must still get a DELETE
    one poll later — the epoch keyset is cur_keys UNION the delta's keys,
    so every emitted row is diffable."""
    ks = str(tmp_path / "keysets")
    src = PollingSource(
        [("shop", "users")], "updated_at", "id",
        delete_detection="snapshot-diff", keyset_path=ks,
    )
    src._write_keyset(_rows(spark, BASE).select("id", "updated_at"), "shop.users", 0)
    src.state["shop.users"] = TableWatermark(
        ts="2024-01-01 12:00:00", ts_type="timestamp", pk=3, keys_epoch=0
    )
    ghost = (5, _ts("2024-01-02 09:00:00"), "ghost")
    calls = {"n": 0}

    def reader(db, tbl):
        calls["n"] += 1
        # the poll's FIRST read (delta scan) sees the ghost; the key scan
        # and every later read run after its deletion
        return _rows(spark, BASE + [ghost] if calls["n"] == 1 else BASE)

    env, new_state, cached = src.poll(reader, 1_700_000_000_000)
    ops = {(json.loads(r["payload"])["id"], r["_op"]) for r in env.collect()}
    assert (5, "INSERT") in ops  # the ghost WAS emitted downstream
    assert not any(op == "DELETE" for _, op in ops)
    src.state = new_state
    for c in cached:
        c.unpersist()

    env2, new_state2, cached2 = src.poll(reader, 1_700_000_001_000)
    assert env2 is not None, "ghost delete lost: second poll emitted nothing"
    payloads = [(json.loads(r["payload"]), r["_op"]) for r in env2.collect()]
    dels = [p for p, op in payloads if op == "DELETE"]
    assert [p["id"] for p in dels] == [5]
    # the DELETE carries the ghost's last-seen watermark (from the delta)
    assert dels[0].get("updated_at", "").startswith("2024-01-02")
    for c in cached2:
        c.unpersist()


def test_polling_crash_between_keyset_and_offset_reemits_deletes(spark, tmp_path):
    """At-least-once: the keyset epoch is written BEFORE the offset file
    commits, so a crash between the two RE-EMITS the interrupted poll's
    DELETEs on resume (duplicate-DELETE, the documented contract matching
    the reference's duplicate-replay on restart) — never loses them."""
    ks = str(tmp_path / "keysets")
    src = PollingSource(
        [("shop", "users")], "updated_at", "id",
        delete_detection="snapshot-diff", keyset_path=ks,
    )
    src._write_keyset(_rows(spark, BASE).select("id", "updated_at"), "shop.users", 0)
    src.state["shop.users"] = TableWatermark(
        ts="2024-01-01 12:00:00", ts_type="timestamp", pk=3, keys_epoch=0
    )
    reader = lambda db, tbl: _rows(spark, [BASE[0], BASE[2]])  # row 2 gone

    env, new_state, cached = src.poll(reader, 1)
    assert {
        (json.loads(r["payload"])["id"], r["_op"]) for r in env.collect()
    } == {(2, "DELETE")}
    for c in cached:
        c.unpersist()
    # CRASH: epoch 1 is on disk but new_state was never adopted/persisted.
    # The resumed poll diffs against epoch 0 again → duplicate DELETE.
    env2, _, cached2 = src.poll(reader, 2)
    assert env2 is not None, "delete LOST after crash (must be re-emitted)"
    assert {
        (json.loads(r["payload"])["id"], r["_op"]) for r in env2.collect()
    } == {(2, "DELETE")}
    for c in cached2:
        c.unpersist()


def test_polling_snapshot_diff_reads_legacy_keyonly_epochs(spark, tmp_path):
    """Backward compat: epochs written by the pre-r12 format carry ONLY
    the key column. The diff joins on the key alone, so a resumed job
    must still emit the DELETE (with no watermark context — the payload
    simply lacks the column), and the NEXT epoch it writes upgrades to
    the (key, wm) schema."""
    ks = str(tmp_path / "keysets")
    src = PollingSource(
        [("shop", "users")], "updated_at", "id",
        delete_detection="snapshot-diff", keyset_path=ks,
    )
    # legacy epoch: key only
    src._write_keyset(_rows(spark, BASE).select("id"), "shop.users", 0)
    src.state["shop.users"] = TableWatermark(
        ts="2024-01-01 12:00:00", ts_type="timestamp", pk=3, keys_epoch=0
    )
    reader = lambda db, tbl: _rows(spark, [BASE[0], BASE[2]])  # row 2 gone
    env, new_state, cached = src.poll(reader, 1)
    payloads = [(json.loads(r["payload"]), r["_op"]) for r in env.collect()]
    assert [(p["id"], op) for p, op in payloads] == [(2, "DELETE")]
    assert "updated_at" not in payloads[0][0]  # legacy epoch had no wm
    for c in cached:
        c.unpersist()
    # the NEW epoch (1) was written in the upgraded (key, wm) schema
    ep1 = spark.read.parquet(f"{ks}/shop.users/epoch=1")
    assert set(ep1.columns) == {"id", "updated_at"}


def test_polling_snapshot_diff_with_ts_equal_pk(spark, tmp_path):
    """watermark.column == key.column (a legal pk-incrementing spelling):
    the keyset must not select the column twice (duplicate-column parquet
    write error) and deletes still flow."""
    ks = str(tmp_path / "keysets")
    src = PollingSource(
        [("shop", "users")], "id", "id",
        delete_detection="snapshot-diff", keyset_path=ks,
    )
    assert src._keyset_cols() == ["id"]
    src._write_keyset(_rows(spark, BASE).select("id"), "shop.users", 0)
    src.state["shop.users"] = TableWatermark(
        ts="3", ts_type="bigint", pk=3, keys_epoch=0
    )
    calls = {"n": 0}

    def reader(db, tbl):
        calls["n"] += 1
        # first poll: row 2 deleted AND row 4 inserted
        return _rows(spark, [BASE[0], BASE[2],
                             (4, _ts("2024-01-02 10:00:00"), "d")])

    env, new_state, cached = src.poll(reader, 1)
    ops = {(json.loads(r["payload"])["id"], r["_op"]) for r in env.collect()}
    assert (4, "INSERT") in ops and (2, "DELETE") in ops
    for c in cached:
        c.unpersist()


def test_polling_delete_detection_config_validation():
    with pytest.raises(ValueError, match="unknown polling.delete.detection"):
        PollingSource([("d", "t")], "ts", "id", delete_detection="bogus")
    with pytest.raises(ValueError, match="snapshot-diff"):
        PollingSource([("d", "t")], "ts", None, delete_detection="snapshot-diff")
    with pytest.raises(ValueError, match="snapshot-diff"):
        PollingSource([("d", "t")], "ts", "id", delete_detection="snapshot-diff")

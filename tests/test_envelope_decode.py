"""decode_raw: raw Debezium-style JSON → typed envelope (T1-T4 semantics)."""

import json

from conftest import make_mysql_ddl, make_mysql_row

from flink_cdc_multi_spark.sources.debezium_json import decode_raw


def _decode(spark, lines, source_type):
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    return decode_raw(df, source_type)


def test_mysql_image_pick_and_ops(spark):
    lines = [
        make_mysql_row(op="r", after={"id": 1, "v": "a"}, snapshot="true", file=None, pos=None),
        make_mysql_row(op="c", after={"id": 2, "v": "b"}, pos=100),
        make_mysql_row(op="u", before={"id": 2, "v": "b"}, after={"id": 2, "v": "c"}, pos=200),
        make_mysql_row(op="d", before={"id": 2, "v": "c"}, after=None, pos=300),
    ]
    rows = _decode(spark, lines, "mysql").orderBy("_ts", "_binlog_pos_end").collect()
    ops = [r["_op"] for r in rows]
    assert ops == ["READ", "INSERT", "UPDATE", "DELETE"]
    payloads = [json.loads(r["payload"]) for r in rows]
    assert payloads[1] == {"id": 2, "v": "b"}
    assert payloads[2] == {"id": 2, "v": "c"}  # UPDATE carries after
    assert payloads[3] == {"id": 2, "v": "c"}  # DELETE carries before
    assert rows[1]["_db"] == "testdb" and rows[1]["_tbl"] == "users"
    assert rows[1]["_binlog_file_internal"] == "mysql-bin.000001"


def test_ts_wall_clock_fallback(spark):
    rows = _decode(
        spark, [make_mysql_row(op="c", after={"id": 1}, ts_ms=0)], "mysql"
    ).collect()
    assert rows[0]["_ts"] > 1_600_000_000_000  # wall clock, not 0


def test_name_sanitization(spark):
    line = make_mysql_row(db="my-db.x", table="my-table", op="c", after={"id": 1})
    r = _decode(spark, [line], "mysql").first()
    assert r["_db"] == "my_db_x"
    assert r["_tbl"] == "my_table"
    assert r["_database"] == "my-db.x"  # original retained for name maps


def test_mysql_ddl_routing_fields(spark):
    line = make_mysql_ddl(ddl="ALTER TABLE users ADD COLUMN x INT", table="users")
    r = _decode(spark, [line], "mysql").first()
    assert r["_tbl"] == "_testdb_ddl"
    assert r["_ddl_tbl"] == "users"
    assert r["_op"] is None
    assert r["_ddl"].startswith("ALTER")


def test_oracle_op_codes_and_scn_default(spark):
    line = json.dumps(
        {
            "op": "u",
            "ts_ms": 1700000000001,
            "before": {"ID": "1", "V": "a"},
            "after": {"ID": "1", "V": "b"},
            "source": {"db": "ORCL", "schema": "HR", "table": "EMP"},
        }
    )
    r = _decode(spark, [line], "oracle").first()
    assert r["_op"] == "UPDATE"
    assert r["_scn"] == "0"  # default when missing
    assert r["_schema"] == "HR"


def test_mongo_replace_snapshot_and_oid(spark):
    lines = [
        json.dumps(
            {
                "op": "REPLACE",
                "ts_ms": 1,
                "after": {"a": 1},
                "source": {"db": "d", "collection": "c", "snapshot": "false"},
                "_id": json.dumps({"$oid": "65f0a"}),
            }
        ),
        json.dumps(
            {
                "op": "INSERT",
                "ts_ms": 2,
                "after": {"a": 2},
                "source": {"db": "d", "collection": "c", "snapshot": "true"},
                "_id": "plain-id",
            }
        ),
    ]
    rows = _decode(spark, lines, "mongodb").orderBy("_ts").collect()
    assert rows[0]["_op"] == "UPDATE"  # REPLACE → UPDATE
    assert rows[0]["_id"] == "65f0a"  # $oid extracted
    assert rows[1]["_op"] == "READ"  # snapshot INSERT → READ
    assert rows[1]["_id"] == "plain-id"


def test_debezium_enum_name_create(spark):
    line = make_mysql_row(op="CREATE", after={"id": 9})
    assert _decode(spark, [line], "mysql").first()["_op"] == "INSERT"


def test_decode_raw_fuzz_never_crashes_and_drops_artifacts(spark):
    """Wire-garbage robustness: arbitrary lines (invalid JSON, wrong-typed
    fields, heartbeats, nulls, partial envelopes) must never crash
    decode_raw for ANY source type, and rows that carry neither an op,
    a DDL, nor a database identity (heartbeats/tombstones/junk) must be
    dropped rather than forwarded to routing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalar = st.one_of(
        st.none(), st.integers(-2**40, 2**40), st.text(max_size=8), st.booleans()
    )
    envelope = st.fixed_dictionaries(
        {},
        optional={
            "op": st.one_of(scalar, st.sampled_from(["r", "c", "u", "d", "CREATE"])),
            "ts_ms": scalar,
            "ddl": scalar,
            "before": st.one_of(scalar, st.dictionaries(st.text(max_size=5), scalar, max_size=2)),
            "after": st.one_of(scalar, st.dictionaries(st.text(max_size=5), scalar, max_size=2)),
            "source": st.one_of(
                scalar,
                st.fixed_dictionaries(
                    {},
                    optional={
                        "db": scalar,
                        "schema": scalar,
                        "table": scalar,
                        "collection": scalar,
                        "file": scalar,
                        "pos": scalar,
                        "lsn": scalar,
                        "scn": scalar,
                        "snapshot": scalar,
                    },
                ),
            ),
            "transaction": st.one_of(scalar, st.fixed_dictionaries({}, optional={"id": scalar})),
            "databaseName": scalar,
            "tableChanges": st.one_of(scalar, st.lists(st.fixed_dictionaries({}, optional={"id": scalar}), max_size=2)),
        },
    )
    line = st.one_of(
        st.text(max_size=30),                       # invalid JSON
        envelope.map(json.dumps),                   # structured-ish
        st.just(json.dumps({"ts_ms": 1})),          # heartbeat
    )

    @settings(max_examples=15, deadline=None)
    @given(st.lists(line, min_size=1, max_size=8), st.sampled_from(["mysql", "postgres", "oracle", "mongodb"]))
    def run(lines, source_type):
        rows = _decode(spark, lines, source_type).collect()
        for r in rows:
            # the artifact-drop contract: every surviving row has identity
            assert r["_op"] is not None or r["_ddl"] is not None or r["_db"] is not None

    run()

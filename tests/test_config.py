import pytest

from flink_cdc_multi_spark.config import ConfigError, JobConfig


def test_required_keys():
    with pytest.raises(ConfigError, match="missing required"):
        JobConfig.from_dict({"source.type": "mysql"})
    with pytest.raises(ConfigError, match="unknown source.type"):
        JobConfig.from_dict(
            {"source.id": "x", "source.type": "db2", "sink.path": "/t"}
        )


def test_reference_example_config_parses():
    cfg = JobConfig.from_dict(
        {
            "sink.path": "/data/ods",
            "source.type": "mysql",
            "source.id": "mysource",
            "source.database.list": "test",
            "snapshot.only": "false",
            "checkpoint.interval": 10,
            "offset.store.path": "/offsets",
            "offset.value": {"file": "mysql-bin.000003", "pos": 43650},
            "database.name.map": {"test": "test_prod"},
            "table.name.map": {"dummy": "dummy_v20240713"},
            "startup.mode": "timestamp",
            "datetime.offset": "2024-01-01T00:00:00",
        }
    )
    assert cfg.source_id == "mysource"
    assert cfg.checkpoint_interval_s == 10
    assert cfg.offset_value == "mysql-bin.000003,43650"
    assert cfg.database_name_map == {"test": "test_prod"}
    assert cfg.source_database_list == ["test"]
    assert cfg.startup_mode == "timestamp"
    assert cfg.snapshot_only is False


def test_defaults():
    cfg = JobConfig.from_dict(
        {"source.id": "s", "source.type": "mongodb", "sink.path": "/t"}
    )
    assert cfg.checkpoint_interval_s == 30  # FlinkCDCMulti.java:418
    assert cfg.mongodb_deserialization_mode == "top-level-type"
    assert cfg.table_name_map == {}


def test_compaction_zorder_columns_validation():
    base = {"source.id": "x", "source.type": "mysql", "sink.path": "/t"}
    cfg = JobConfig.from_dict(
        {**base, "compaction.zorder.columns": ["id", "_ts"]}
    )
    assert cfg.compaction_zorder_columns == ["id", "_ts"]
    assert JobConfig.from_dict(base).compaction_zorder_columns == []
    # the Morton interleave is 2-D: one or three columns are config errors
    with pytest.raises(ConfigError, match="exactly two"):
        JobConfig.from_dict({**base, "compaction.zorder.columns": "id"})
    with pytest.raises(ConfigError, match="exactly two"):
        JobConfig.from_dict(
            {**base, "compaction.zorder.columns": ["a", "b", "c"]}
        )
    # an explicit empty list is the natural "disabled" spelling and must
    # behave like an absent key, not raise (ADVICE r16)
    cfg_empty = JobConfig.from_dict(
        {**base, "compaction.zorder.columns": []}
    )
    assert cfg_empty.compaction_zorder_columns == []

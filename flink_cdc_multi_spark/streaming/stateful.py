"""Custom stateful streaming operators via applyInPandasWithState —
the Spark-native equivalent of the reference's keyed ProcessFunction state
(SURVEY.md §2.6: ST1-ST8 map to exactly this API when state must live
per-key inside the stream rather than driver-side).

Provided operator: per-key running status (record count + last event
timestamp + last offset) — the distributed generalization of ST8's global
counters: state is partitioned by key across executors, checkpointed by
Structured Streaming, and emitted once per key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("max_offset", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("record_count", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("max_offset", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # GroupState.get is a property in PySpark (returns the state tuple)
    count, last_ts, max_off = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        count += len(pdf)
        if len(pdf):
            last_ts = max(last_ts, int(pdf["_ts"].max()))
            max_off = max(max_off, int(pdf["offset"].max()))
    state.update((count, last_ts, max_off))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "record_count": [count],
            "last_ts": [last_ts],
            "max_offset": [max_off],
        }
    )


def running_status_by_key(
    envelope: DataFrame, key_col: str, offset_col: str
) -> DataFrame:
    """Streaming DataFrame (must contain ``_ts`` and ``offset_col``) →
    one updated status row per key per micro-batch, with per-key state
    maintained by the engine (update output mode)."""
    from pyspark.sql import functions as F

    keyed = envelope.select(
        F.col(key_col).cast("string").alias("key"),
        F.col("_ts").cast("long").alias("_ts"),
        F.col(offset_col).cast("long").alias("offset"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_STATUS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

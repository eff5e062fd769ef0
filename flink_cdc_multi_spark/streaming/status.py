"""Status store (reference ST8,
java/processfunctions/common/StatusStoreProcessFunction.java:18-91): running
record count + last event timestamp, flushed as a JSON file per checkpoint.

Spark mapping: accumulate in the foreachBatch loop (the micro-batch is the
checkpoint) and overwrite ``<store>/<job_id>_status.json``. Shape per
FIXTURES.md §B6: job_id, job_name, record_count, last_event_timestamp,
last_checkpoint_timestamp.
"""

from __future__ import annotations

import json
import time

from flink_cdc_multi_spark.sources import fsio


class StatusStore:
    def __init__(self, store_path: str, job_id: str, job_name: str):
        self.path = fsio.join(store_path, f"{job_id}_status.json")
        self.job_id = job_id
        self.job_name = job_name
        self.record_count = 0
        self.last_event_timestamp: int | None = None

    def update(self, batch_count: int, batch_max_ts: int | None) -> None:
        self.record_count += batch_count
        if batch_max_ts is not None:
            if self.last_event_timestamp is None or batch_max_ts > self.last_event_timestamp:
                self.last_event_timestamp = batch_max_ts

    def flush(self) -> dict:
        status = {
            "job_id": self.job_id,
            "job_name": self.job_name,
            "record_count": self.record_count,
            "last_event_timestamp": self.last_event_timestamp,
            "last_checkpoint_timestamp": int(time.time() * 1000),
        }
        fsio.write_text_atomic(self.path, json.dumps(status))
        return status

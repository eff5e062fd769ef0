"""Controlled one-pass↔general crossover sweep (PERF.md streaming table).

One Spark session, modes alternated back-to-back per table count,
min-of-N wall — separate-JVM runs carry ±20% ambient-load noise (the r5
lesson; that methodology produced contradictory orderings). This is the
harness behind the PERF.md table; tools/bench_streaming.py measures ONE
configuration per JVM for absolute rows/sec.

Usage: python tools/sweep_onepass.py [sf_dir] [n_files] [repeats] [widths...]
Defaults: sf0.1, 4 files, 2 repeats, widths 16 32 64 128.
Prints one JSON line per width plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.catalog import TableRegistry  # noqa: E402
from flink_cdc_multi_spark.config import JobConfig  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402
from flink_cdc_multi_spark.streaming.pipeline import CDCPipeline  # noqa: E402

from bench_streaming import EVENTS_SCHEMA  # noqa: E402  (same dir)


def build_feed(spark, sf_dir: str, feed: str, n_files: int, n_tables: int) -> int:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_rows = events.count()
    wire = events.select(
        F.to_json(
            F.struct(
                F.lit("c").alias("op"),
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
                F.struct(
                    "event_id", "user_id", "event_type", "value", "props"
                ).alias("after"),
                F.struct(
                    F.lit("bench").alias("db"),
                    F.concat(F.lit("events_"), F.col("event_id") % n_tables).alias(
                        "table"
                    ),
                    F.lit("feed-bin.000001").alias("file"),
                    F.col("event_id").alias("pos"),
                ).alias("source"),
                F.lit("feed-bin.000001").alias("offset_file"),
                F.col("event_id").alias("offset_pos"),
            )
        ).alias("value")
    )
    wire.repartition(n_files).write.mode("overwrite").text(feed)
    return n_rows


def run_once(spark, work: str, feed: str, n_tables: int, onepass_max: int) -> float:
    for sub in ("sink", "store", "ckpt"):
        shutil.rmtree(os.path.join(work, sub), ignore_errors=True)
    cfg = JobConfig.from_dict(
        {
            "source.id": "sweep",
            "source.type": "mysql",
            "sink.path": os.path.join(work, "sink"),
            "offset.store.path": os.path.join(work, "store"),
            "status.store.path": os.path.join(work, "store"),
            "checkpoint.interval": 0,
            "streaming.onepass.max.tables": onepass_max,
        }
    )
    registry = TableRegistry.build(
        "mysql", {("bench", f"events_{i}"): EVENTS_SCHEMA for i in range(n_tables)}
    )
    pipe = CDCPipeline(cfg, registry)
    t0 = time.perf_counter()
    q = pipe.start(spark, feed, os.path.join(work, "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    wall = time.perf_counter() - t0
    assert pipe.batches_processed > 0
    return wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    widths = [int(w) for w in sys.argv[4:]] or [16, 32, 64, 128]

    spark = get_spark("onepass-sweep")
    work = tempfile.mkdtemp(prefix="onepass_sweep_")
    out = []
    try:
        for n_tables in widths:
            feed = os.path.join(work, f"feed_{n_tables}")
            n_rows = build_feed(spark, sf_dir, feed, n_files, n_tables)
            walls = {"onepass": [], "general": []}
            for _ in range(repeats):  # alternate back-to-back per repeat
                walls["onepass"].append(run_once(spark, work, feed, n_tables, 999))
                walls["general"].append(run_once(spark, work, feed, n_tables, 0))
            row = {
                "n_tables": n_tables,
                "rows": n_rows,
                "onepass_sec": round(min(walls["onepass"]), 2),
                "general_sec": round(min(walls["general"]), 2),
                "onepass_rows_per_sec": round(n_rows / min(walls["onepass"]), 1),
                "general_rows_per_sec": round(n_rows / min(walls["general"]), 1),
                "onepass_advantage_pct": round(
                    100 * (min(walls["general"]) / min(walls["onepass"]) - 1), 1
                ),
            }
            out.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({"sweep": out, "sf_dir": sf_dir, "n_files": n_files}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""The streaming CDC pipeline: one input stream → foreachBatch →
{per-table parquet, DDL tables, offset file, status file, stop control}.

Topology parity with the reference (SURVEY.md §3.2-3.3):

    Flink:  source → deserializer → keyBy(null) → stop-controller →
            keyBy(null) → router → [per-table map→FileSink]
            (+ offset-store branch, + status-store branch, checkpoint-aligned)

    here:   readStream(text) → decode_raw (envelope) → foreachBatch:
              1. route_batch: per-table typed parquet appends (dt-bucketed)
              2. reduce_offset → offset file   (after writes: at-least-once)
              3. status accumulate → status file
              4. control: DDL classification / snapshot-completion → stop

The micro-batch replaces Flink's checkpoint alignment: everything that the
reference does "on checkpoint complete" happens after the batch's writes
return. The 10 s delayed-stop timer (DelayedStopSignalProcessFunction.java:215)
becomes batch-aligned stop: the triggering batch commits fully, then the
query stops before the next batch — same contract ("flush in-flight, then
halt", README.md:26) with a cleaner guarantee (SURVEY.md §7.5).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_multi_spark.catalog import TableRegistry
from flink_cdc_multi_spark.config import JobConfig
from flink_cdc_multi_spark.envelope import OP_READ
from flink_cdc_multi_spark.operators.ddl import DDLDecision, classify, is_truncate
from flink_cdc_multi_spark.operators.routing import route_batch
from flink_cdc_multi_spark.sources.debezium_json import read_raw_stream
from flink_cdc_multi_spark.sources import fsio
from flink_cdc_multi_spark.sources.offsets import (
    OffsetFileStore,
    offset_greater,
    resume_filter,
)
from flink_cdc_multi_spark.streaming.status import StatusStore

LOG = logging.getLogger(__name__)


def batch_summary(envelope: DataFrame, source_type: str) -> list:
    """ONE grouped aggregation per micro-batch carrying every control-plane
    read: per-(db,tbl) counts, snapshot-completion flags (ST1), max event
    ts (ST8), DDL statements (F3/F4), and the per-source offset reduction
    (ST4-ST7, same predicates as sources/offsets.reduce_offset). Each of
    these was previously its own job; at streaming cadence the per-job
    scheduling floor — not the data — dominated the batch, and at cluster
    scale five passes over the batch are four too many. Returns the
    collected per-group rows (~|tables|, bounded)."""
    not_read = F.col("_op").isNull() | (F.col("_op") != OP_READ)
    aggs = [
        F.count("*").alias("n"),
        # null for groups with no op-bearing rows (pure-DDL groups)
        F.max(F.when(F.col("_op").isNotNull(), F.col("_op") != OP_READ)).alias(
            "non_read"
        ),
        F.max("_ts").alias("max_ts"),
        F.collect_list(
            F.when(F.col("_ddl").isNotNull(), F.struct("_ddl", "_ddl_tbl"))
        ).alias("ddl"),
    ]
    if source_type == "mysql":
        has = not_read & F.col("_binlog_file").isNotNull()
        pos = F.when(has, F.struct("_binlog_file", "_binlog_pos_end"))
        aggs.append(F.max_by(pos, pos).alias("offset"))  # null ord rows skipped
    elif source_type == "postgres":
        aggs.append(F.max(F.when(not_read & F.col("_lsn").isNotNull(), F.col("_lsn"))).alias("offset"))
    elif source_type == "oracle":
        aggs.append(
            F.max(
                F.when(
                    F.col("_scn").isNotNull() & (F.col("_scn") != "0"),
                    F.col("_scn").cast("decimal(38,0)"),
                )
            ).alias("offset")
        )
    elif source_type == "mongodb":
        aggs.append(F.max(F.when(F.col("_op") != OP_READ, F.col("_ts"))).alias("offset"))
    else:
        raise ValueError(f"unknown source type: {source_type}")
    return envelope.groupBy("_db", "_tbl").agg(*aggs).collect()


def summary_offset(rows: list, source_type: str) -> str | None:
    """Fold per-group offsets to the batch offset string (same formats as
    reduce_offset: mysql 'file,pos', pg LSN, oracle SCN, mongo ts)."""
    best: str | None = None
    for r in rows:
        o = r["offset"]
        if o is None:
            continue
        s = (
            f"{o['_binlog_file']},{o['_binlog_pos_end']}"
            if source_type == "mysql"
            else str(o)
        )
        if best is None or offset_greater(s, best, source_type):
            best = s
    return best


def registry_from_config(cfg: JobConfig, tables) -> TableRegistry:
    """TableRegistry wired from a JobConfig: name maps, unknown-table
    policy, mongo deserialization mode (configureTableNameMap,
    FlinkCDCMulti.java:112)."""
    return TableRegistry.build(
        cfg.source_type,
        tables,
        database_name_map=cfg.database_name_map,
        table_name_map=cfg.table_name_map,
        fail_on_unknown_tables=cfg.fail_on_unknown_tables,
        mongo_mode=cfg.mongodb_deserialization_mode,
    )


class SnapshotPhaseError(RuntimeError):
    """Non-READ op while in snapshot-only mode after completion — the
    reference errors (DelayedStopSignalProcessFunction.java:69-78)."""


@dataclass
class StopController:
    """ST1-ST3 equivalent. All of the reference's 'global keyed state'
    (tiny per-table sets) lives driver-side — the idiomatic Spark home for
    singleton control state; the data path stays fully parallel."""

    snapshot_only: bool
    dialect: str = "mysql"
    target_tables: set[str] | None = None  # {"db.tbl"} sanitized; None = all
    stop_requested: bool = False
    stop_reason: str | None = None
    snapshot_complete: bool = False
    # ST1 per-table sets (processedTablesState / completedTablesState,
    # DelayedStopSignalProcessFunction.java:84-118): a table is "complete"
    # once it has seen a non-READ op; stop arms when every target table
    # completed (or, with no table list, processed == completed).
    processed_tables: set[str] = field(default_factory=set)
    completed_tables: set[str] = field(default_factory=set)

    # -- persistence (the reference checkpoints this state:
    # DelayedStopSignalProcessFunction.java:41-56 initializeState/
    # snapshotState; without it a driver restart re-arms a snapshot-only
    # job from scratch and completions observed before the crash are lost)

    def to_state(self) -> dict:
        return {
            "snapshot_complete": self.snapshot_complete,
            "processed_tables": sorted(self.processed_tables),
            "completed_tables": sorted(self.completed_tables),
        }

    def load_state(self, state: dict) -> None:
        self.snapshot_complete = bool(state.get("snapshot_complete", False))
        self.processed_tables = set(state.get("processed_tables", ()))
        self.completed_tables = set(state.get("completed_tables", ()))
        if self.snapshot_only and self.snapshot_complete:
            # an already-complete snapshot-only job must stop again right
            # away, not idle forever waiting for a completion that happened
            # before the restart
            self.stop_requested = True
            self.stop_reason = (
                "snapshot complete (restored from persisted controller state)"
            )

    def on_ddl_rows(self, ddl_rows: list[dict]) -> None:
        """Structural DDL → arm stop (F3/F4 + ST1 CDC-mode). `ddl_rows` is
        the collected DDL slice of one batch (DDL volume is ~zero)."""
        for row in ddl_rows:
            ddl = row.get("_ddl")
            if not ddl:
                continue
            db, ddl_tbl = row.get("_db"), row.get("_ddl_tbl")
            if self.target_tables is not None and f"{db}.{ddl_tbl}" not in self.target_tables:
                LOG.info("DDL for non-target table ignored: %s.%s", db, ddl_tbl)
                continue
            if is_truncate(ddl):
                LOG.info("TRUNCATE TABLE found; should use snapshot-only mode")
            if classify(ddl, self.dialect) is DDLDecision.IGNORE:
                LOG.info("non-structural DDL ignored: %s", ddl)
                continue
            self.stop_requested = True
            self.stop_reason = f"structural DDL: {ddl}"
            return

    def on_batch_tables(self, table_ops: list[tuple[str, bool]]) -> None:
        """Snapshot-only completion over one batch's (table_key,
        saw_non_read) pairs — the micro-batch granularity of ST1's
        per-record loop (:83-131). Post-completion: READs ignored,
        non-READs error (:69-78)."""
        if not self.snapshot_only or not table_ops:
            return
        if self.snapshot_complete:
            if any(non_read for _, non_read in table_ops):
                raise SnapshotPhaseError(
                    "non-READ op after snapshot completion in snapshot-only mode"
                )
            return
        for key, non_read in table_ops:
            self.processed_tables.add(key)
            if non_read:
                self.completed_tables.add(key)
        if self.target_tables:
            all_done = self.target_tables <= self.completed_tables
        else:
            all_done = (
                bool(self.completed_tables)
                and self.processed_tables == self.completed_tables
            )
        if all_done:
            self.snapshot_complete = True
            self.stop_requested = True
            self.stop_reason = (
                f"snapshot complete (all tables saw non-READ ops: "
                f"{sorted(self.completed_tables)})"
            )


@dataclass
class CDCPipeline:
    config: JobConfig
    registry: TableRegistry
    # (db, tbl) -> StructType | None; typically
    # introspect.introspect_schema over a catalog reader. Consulted for
    # unknown tables when scan.newly.added.tables is on.
    schema_provider: object = None
    controller: StopController = field(init=False)
    status: StatusStore = field(init=False)
    offset_store: OffsetFileStore | None = field(init=False)
    batches_processed: int = 0

    def __post_init__(self):
        cfg = self.config
        self.controller = StopController(
            snapshot_only=cfg.snapshot_only,
            dialect="oracle" if cfg.source_type == "oracle" else "mysql",
            target_tables=set(cfg.source_table_list) or None,
        )
        job_name = cfg.job_name or f"JOB-{cfg.source_id}"
        self.status = StatusStore(
            cfg.status_store_path or cfg.sink_path, cfg.source_id, job_name
        )
        self.offset_store = (
            OffsetFileStore(cfg.offset_store_path, cfg.source_id)
            if cfg.offset_store_path
            else None
        )
        # controller state lives beside the offset file (same durability
        # domain: both are what a restart needs to resume correctly)
        self.controller_path = (
            fsio.join(cfg.offset_store_path, f"{cfg.source_id}_stopctl.json")
            if cfg.offset_store_path
            else None
        )
        if self.controller_path:
            raw = fsio.read_text(self.controller_path)
            if raw:
                self.controller.load_state(json.loads(raw))

    def _resolve_unknown_table(self, db: str, tbl: str):
        """Newly-added-table pickup: when enabled and a schema provider is
        wired, an unseen table is introspected and adopted instead of
        hitting the unknown-table policy (MySQLStreamer.java:302)."""
        if not self.config.scan_newly_added_tables or self.schema_provider is None:
            return None
        schema = self.schema_provider(db, tbl)
        if schema is None:
            return None
        from flink_cdc_multi_spark.catalog import TableSpec

        # adopt under the MAPPED identity: lookup() applies the name maps
        # before consulting specs, so a spec keyed by the raw names would
        # never be found again (re-introspected every batch) and would
        # write to the unmapped output directory.
        mdb, mtbl = self.registry.mapped_names(db, tbl)
        LOG.info("adopting newly added table %s.%s as %s.%s", db, tbl, mdb, mtbl)
        return TableSpec(db=mdb, table=mtbl, payload_schema=schema)

    # -- batch body (also usable standalone for batch-mode ingestion) -----

    def process_batch(self, envelope: DataFrame, batch_id: int) -> None:
        cfg = self.config
        if self.controller.stop_requested:
            # F1 suppression: after the stop signal is armed, drop all
            # subsequent records (DelayedStopSignalProcessFunction.java:138-141)
            return
        envelope = envelope.persist()
        try:
            if cfg.debug:
                # W3/F7 debug print sink (FlinkCDCMulti.java:148-154)
                envelope.show(20, truncate=False)
            # 4a. control-plane reads: ONE grouped pass over the cached
            # batch (counts + ST1 flags + max ts + DDL slice + offset
            # reduction — previously five jobs, each paying the scheduling
            # floor at streaming cadence)
            summary = batch_summary(envelope, cfg.source_type)
            counts = {(r["_db"], r["_tbl"]): r["n"] for r in summary}
            ddl_rows = [
                {"_db": r["_db"], "_ddl": d["_ddl"], "_ddl_tbl": d["_ddl_tbl"]}
                for r in summary
                for d in r["ddl"]
            ]
            n_rows = sum(r["n"] for r in summary)
            ts_vals = [r["max_ts"] for r in summary if r["max_ts"] is not None]
            max_ts = max(ts_vals) if ts_vals else None
            table_ops = [
                (f"{r['_db']}.{r['_tbl']}", bool(r["non_read"]))
                for r in summary
                if r["non_read"] is not None
            ]

            # snapshot-only: drop post-completion READs (F2); error non-READ
            data = envelope
            if cfg.snapshot_only and self.controller.snapshot_complete:
                data = envelope.filter(F.col("_op") == OP_READ).limit(0)
                counts = None  # counts describe the unfiltered batch

            # 1. route + write
            route_batch(
                data,
                self.registry,
                cfg.sink_path,
                cfg.source_id,
                resolve_unknown=self._resolve_unknown_table,
                counts=counts,
            )

            # 2. offset file, AFTER data writes commit (at-least-once, ST4).
            # Advance monotonically: a batch may carry lower offsets than an
            # earlier one (file pickup order ≠ offset order), and the stored
            # offset must never regress or resume would over-replay.
            if self.offset_store is not None:
                offset = summary_offset(summary, cfg.source_type)
                if offset is not None:
                    prev = self.offset_store.read()
                    if prev is None or offset_greater(offset, prev, cfg.source_type):
                        self.offset_store.write(offset)

            # 3. status file (ST8; checkpoint-complete == batch end)
            self.status.update(n_rows, max_ts)
            self.status.flush()

            # 4b. stop decisions take effect before the next batch
            before = self.controller.to_state()
            self.controller.on_batch_tables(table_ops)
            self.controller.on_ddl_rows(ddl_rows)
            if self.controller_path and self.controller.to_state() != before:
                fsio.write_text_atomic(
                    self.controller_path, json.dumps(self.controller.to_state())
                )
            self.batches_processed += 1

            # 5. maintenance compaction every N batches (rebuild improvement
            # over the reference's roll-on-checkpoint-and-never-compact sink;
            # PERF.md names small-file buildup the antidote target). Runs
            # AFTER the offset commit: the replay window on resume starts at
            # the stored offset, so compacting away tombstones/old images
            # below it can never resurrect a row.
            if (
                cfg.compact_every_n_batches
                and cfg.table_key_columns
                and self.batches_processed % cfg.compact_every_n_batches == 0
            ):
                self.run_compaction(envelope.sparkSession)
        finally:
            envelope.unpersist()

    def compaction_order_cols(self) -> list:
        """Monotone per-source ordering over the columns the router KEEPS in
        table output (routing strips raw offset cols; mysql keeps the
        *_internal binlog twins, mongo keeps _ts/_txn_op_index, pg/oracle
        order on _ts)."""
        st = self.config.source_type
        if st == "mysql":
            return ["_binlog_file_internal", "_binlog_pos_internal"]
        if st == "mongodb":
            return [F.col("_ts"), F.col("_txn_op_index").cast("int")]
        return ["_ts"]

    def run_compaction(self, spark) -> dict[str, int]:
        """Compact every table declared in table.key.columns to its
        materialized latest image (operators/cdc.compact_table). Returns
        {table key: compacted row count}."""
        from flink_cdc_multi_spark.operators.cdc import _hadoop_fs, compact_table

        cfg = self.config
        order_cols = self.compaction_order_cols()
        results: dict[str, int] = {}
        for key, key_cols in cfg.table_key_columns.items():
            spec = self.registry.specs.get(key)
            if spec is None or spec.is_ddl:
                LOG.warning("table.key.columns entry %s not in registry; skipped", key)
                continue
            path = f"{cfg.sink_path}/{cfg.source_id}_{spec.output_name}"
            fs, jp = _hadoop_fs(spark, path)
            if not fs.exists(jp):
                continue  # no batch has landed rows for it yet
            results[key] = compact_table(spark, path, key_cols, order_cols)
            LOG.info("compacted %s -> %d rows", key, results[key])
        return results

    # -- streaming driver --------------------------------------------------

    def start(
        self,
        spark: SparkSession,
        input_path: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
    ):
        cfg = self.config
        if cfg.source_type == "oracle" and cfg.startup_mode in ("earliest", "offset"):
            # Oracle earliest/offset startup degrades to initial with a
            # warning (OracleStreamer.java:134-144)
            LOG.warning(
                "oracle startup.mode=%s unsupported; degrading to initial",
                cfg.startup_mode,
            )
            cfg.startup_mode = "initial"
        if cfg.source_type == "postgres" and cfg.startup_mode == "timestamp":
            # PG timestamp startup unsupported (PostgresStreamer.java:148-152)
            raise ValueError("postgres does not support startup.mode=timestamp")
        # config offset.value wins over the stored offset file: configureOffset
        # (FlinkCDCMulti.java:190-193) returns early when offset.value is set
        # and only consults the store otherwise — a user manually
        # re-positioning must not be overridden by a stale offset file. The
        # merge happens BEFORE source-specific startup resolution, matching
        # the reference's configureOffset-then-streamer order, so mongo's
        # compat gate and format validation see the offset that would
        # actually drive the resume (stored or configured).
        stored = self.offset_store.read() if self.offset_store else None
        offset = cfg.offset_value or stored
        if cfg.source_type == "mongodb":
            # version-gated startup matrix (MongoDBStreamer.java:145-231);
            # the server version comes from buildInfo on a live client or
            # the mongodb.server.version config key for feed-based runs
            from flink_cdc_multi_spark.sources.mongo import resolve_mongo_startup

            mode, offset, warnings = resolve_mongo_startup(
                cfg.startup_mode,
                offset,
                cfg.raw.get("mongodb.server.version"),
            )
            for w in warnings:
                LOG.warning("%s", w)
            cfg.startup_mode, cfg.offset_value = mode, offset
        stream = read_raw_stream(
            spark, input_path, cfg.source_type, max_files_per_trigger
        )
        if offset:
            stream = resume_filter(stream, cfg.source_type, offset)
        elif cfg.startup_mode == "timestamp" and cfg.datetime_offset:
            # startup.mode=timestamp: skip events before datetime.offset
            # (MySQLStreamer.java:240-251; zone pinned UTC per SURVEY §7.5,
            # override via source.timezone)
            from datetime import datetime, timezone

            tz = timezone.utc
            dt = datetime.fromisoformat(cfg.datetime_offset).replace(tzinfo=tz)
            start_ms = int(dt.timestamp() * 1000)
            stream = stream.filter(
                F.col("_ddl").isNotNull() | (F.col("_ts") >= start_ms)
            )

        query = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{cfg.checkpoint_interval_s} seconds")
            .start()
        )
        return query

    def run_until_stopped(self, query, poll_s: float = 0.25, timeout_s: float | None = None):
        """Await the stop controller: the triggering batch commits, then the
        query stops before the next trigger (batch-aligned stop, §7.5)."""
        import time

        t0 = time.time()
        while query.isActive:
            if self.controller.stop_requested:
                query.stop()
                break
            if timeout_s is not None and time.time() - t0 > timeout_s:
                break
            time.sleep(poll_s)
        query.awaitTermination(10)
        return self.controller.stop_reason

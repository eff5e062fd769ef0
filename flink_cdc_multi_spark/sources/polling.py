"""Polling incremental mode for live JDBC sources (VERDICT r10 item 2).

The reference embeds log-tailing clients that speak binlog/WAL/LogMiner
directly (java/streamers/MySQLStreamer.java:215-311,
PostgresStreamer.java:128-184, OracleStreamer.java:128-173). This engine's
streaming legs ingest Debezium-JSON from a file feed or Kafka — the right
Spark architecture when a Debezium/Connect tier exists, but a user pointing
the job at a bare MySQL with nothing in front had no incremental path.

This module closes that gap with HIGH-WATERMARK DELTA POLLING — the
Kafka-Connect-JDBC-source incremental contract, re-expressed on
``spark.read.jdbc``:

- ``timestamp+incrementing`` (both columns configured): each poll fetches
  rows where ``(wm_ts, pk) > (last_ts, last_pk)`` lexicographically — new
  rows AND updated rows (whose ``updated_at`` advanced) are picked up, and
  same-timestamp ties can't be lost or re-emitted. Rows with
  ``pk > last_pk`` classify as inserts (op ``c``), the rest as updates
  (``u``).
- ``incrementing`` (key column only): ``pk > last_pk``, all inserts.
  Updates are invisible — append-only tables only.
- ``timestamp`` (watermark column only): ``wm_ts > last_ts``, emitted as
  upserts (``u``); a downstream materialization treats c/u identically.

Deletes never appear in a watermark delta — the inherent gap between
polling and log tailing. ``polling.delete.detection = snapshot-diff``
(r11) closes it at POLL granularity: each poll re-reads the key (+
watermark) columns (pruned at the source), anti-joins them against the
previous poll's persisted key set, and emits DELETE envelopes for rows
that vanished; the current keys become the next epoch, committed with
the same at-least-once ordering as the watermark file. The persisted
epochs carry ``(key, last-seen watermark)`` (r12), so a DELETE payload
includes the row's last-observed watermark — enough context for a
downstream materialization to tombstone with "deleted after wm=X".
``polling.keyset.context.columns`` (r13, VERDICT r12 item 5) opts
selected extra columns into the epoch, so DELETE payloads carry the
row's LAST-OBSERVED values for those columns (a Debezium-tombstone
``before`` image trimmed to the configured columns) — config-gated
because each column grows every epoch by its width × row count.
Every emitted row is guaranteed diffable: the epoch keyset is the
CURRENT key scan UNION the delta's keys, so a row that appears in the
delta but is deleted before the key scan still enters the epoch and its
DELETE is caught one poll later instead of silently lost (ADVICE r11
ghost-row fix); for a key on both sides the epoch keeps the row at max
(watermark, current-scan-preferred) atomically — wm and context always
come from the SAME observation. Stated limits: a row inserted AND
deleted entirely between two polls is invisible, deletes carry the
last OBSERVED values (poll granularity — writes between the last poll
and the delete are not in them; never a true final image), and each
poll pays a key-column scan — log tailing (the Debezium feed/Kafka
legs) remains the answer when those matter.

At-least-once DELETE contract (mirrors the reference's duplicate-replay
contract on restart — its streamers re-read from the committed offset
and may replay events, MySQLStreamer.java resume path): the keyset epoch
is written BEFORE the watermark file commits, so a crash between the two
re-diffs against the PREVIOUS epoch on resume and re-emits (never loses)
the DELETE envelopes. Downstream consumers must treat DELETE by key
idempotently — latest_image's max_by reduction already does.

Scale shape: the watermark predicate is a plain ``col > literal``
comparison, so Spark's JDBC relation pushes it INTO the source query
(``WHERE wm > ?`` — the database's index on the watermark column does the
work; no full-table scan ships over the wire), and the chunked-snapshot
split planner (sources/jdbc.py) still applies to the initial snapshot. Each
poll is a bounded batch through the SAME envelope → route_batch → offset
path the streaming legs use; nothing downstream knows the transport
changed.

Offset contract: the per-table watermark state is one JSON object persisted
with the same atomic single-file write as every other offset store (W2,
sources/fsio.py), honoring the reference's precedence — a configured
``offset.value`` beats the stored file (FlinkCDCMulti.java:190-193), and
``startup.mode`` = initial|latest|offset|timestamp select snapshot-then-
poll, poll-from-current-max, resume-from-value, and poll-since-datetime.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_multi_spark.sources import fsio

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer"}


@dataclass
class TableWatermark:
    """Last-seen high watermark for one table. Values are stored as
    strings (JSON-safe) together with the column's Spark type so the
    resume filter can rebuild a correctly-typed literal — a timestamp
    compared against a string literal would not push down."""

    ts: str | None = None
    ts_type: str | None = None
    pk: int | None = None
    keys_epoch: int | None = None  # committed key-set epoch (delete diff)

    def to_dict(self) -> dict:
        return {
            "ts": self.ts,
            "ts_type": self.ts_type,
            "pk": self.pk,
            "keys_epoch": self.keys_epoch,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TableWatermark":
        pk = d.get("pk")
        ep = d.get("keys_epoch")
        return cls(
            d.get("ts"),
            d.get("ts_type"),
            int(pk) if pk is not None else None,
            int(ep) if ep is not None else None,
        )


def _ts_literal(wm: TableWatermark) -> Column:
    lit = F.lit(wm.ts)
    return lit.cast(wm.ts_type) if wm.ts_type else lit


def delta_filter(
    df: DataFrame,
    ts_col: str | None,
    pk_col: str | None,
    wm: TableWatermark,
) -> DataFrame:
    """Rows strictly above the watermark. All three modes compile to
    ``col > literal`` (+ ``AND``/``OR``) — the shape the JDBC relation
    pushes down into the remote WHERE clause."""
    if ts_col and pk_col:
        if wm.ts is None:
            return df if wm.pk is None else df.filter(F.col(pk_col) > F.lit(wm.pk))
        ts_lit = _ts_literal(wm)
        cond = F.col(ts_col) > ts_lit
        if wm.pk is not None:
            cond = cond | ((F.col(ts_col) == ts_lit) & (F.col(pk_col) > F.lit(wm.pk)))
        return df.filter(cond)
    if pk_col:
        return df if wm.pk is None else df.filter(F.col(pk_col) > F.lit(wm.pk))
    if ts_col:
        return df if wm.ts is None else df.filter(F.col(ts_col) > _ts_literal(wm))
    raise ValueError("polling needs polling.key.column and/or polling.watermark.column")


def observe_watermark(
    df: DataFrame, ts_col: str | None, pk_col: str | None, prev: TableWatermark
) -> TableWatermark:
    """max(ts), max(pk) over a batch, merged monotonically into ``prev``
    (one aggregate job; None-safe for empty batches)."""
    aggs = []
    if ts_col:
        aggs.append(F.max(ts_col).alias("mx_ts"))
    if pk_col:
        aggs.append(F.max(pk_col).alias("mx_pk"))
    row = df.agg(*aggs).first()
    new = TableWatermark(prev.ts, prev.ts_type, prev.pk, prev.keys_epoch)
    if ts_col and row["mx_ts"] is not None:
        new.ts_type = dict(df.dtypes)[ts_col]
        mx = row["mx_ts"]
        s = mx.isoformat(sep=" ") if hasattr(mx, "isoformat") else str(mx)
        if prev.ts is None or s > prev.ts or new.ts_type in _NUMERIC_TYPES:
            # string compare is correct for ISO timestamps; numerics
            # compare numerically to avoid "9" > "10"
            if new.ts_type in _NUMERIC_TYPES and prev.ts is not None:
                s = str(max(int(float(s)), int(float(prev.ts))))
            new.ts = s
    if pk_col and row["mx_pk"] is not None:
        new.pk = max(int(row["mx_pk"]), prev.pk) if prev.pk is not None else int(
            row["mx_pk"]
        )
    return new


def delta_to_envelope(
    delta: DataFrame,
    db: str,
    table: str,
    pk_col: str | None,
    last_pk: int | None,
    ts_ms: int,
    source_type: str = "mysql",
) -> DataFrame:
    """Delta rows → change envelope (same wire shape as the streaming
    decoder and snapshot_to_envelope, so route_batch/compaction/status are
    shared verbatim; the source's log-offset columns are null — a polled
    row has no binlog/LSN/SCN position, exactly like a snapshot READ, so
    the log-offset store correctly never advances from a poll). Insert-
    vs-update classification: with an incrementing key, ``pk > last_pk``
    is an insert; everything else an update. Without a key column every
    delta row is an upsert ``u``."""
    from flink_cdc_multi_spark.envelope import OP_INSERT, OP_UPDATE
    from flink_cdc_multi_spark.functions.sanitizer import sanitize

    if pk_col is not None and last_pk is not None:
        op = F.when(F.col(pk_col) > F.lit(last_pk), F.lit(OP_INSERT)).otherwise(
            F.lit(OP_UPDATE)
        )
    elif pk_col is not None:
        op = F.lit(OP_INSERT)  # first poll after latest/initial: all new
    else:
        op = F.lit(OP_UPDATE)
    cols = [
        F.lit(sanitize(db)).alias("_db"),
        F.lit(sanitize(table)).alias("_tbl"),
        F.lit(db).alias("_database"),
        op.alias("_op"),
        F.lit(ts_ms).cast("long").alias("_ts"),
        F.lit(None).cast("string").alias("_ddl"),
        F.lit(None).cast("string").alias("_ddl_tbl"),
        F.to_json(F.struct(*delta.columns)).alias("payload"),
        F.lit(False).alias("_snapshotting"),
    ]
    if source_type == "mysql":
        cols += [
            F.lit(None).cast("string").alias("_binlog_file"),
            F.lit(None).cast("long").alias("_binlog_pos_end"),
            F.lit(None).cast("string").alias("_binlog_file_internal"),
            F.lit(None).cast("long").alias("_binlog_pos_internal"),
        ]
    elif source_type == "postgres":
        cols += [
            F.lit(db).alias("_schema"),
            F.lit(None).cast("long").alias("_lsn"),
        ]
    elif source_type == "oracle":
        cols += [
            F.lit(db).alias("_schema"),
            F.lit("0").alias("_scn"),
        ]
    else:
        raise ValueError(f"polling does not support source type: {source_type}")
    return delta.select(*cols)


def deletes_to_envelope(
    keys: DataFrame, db: str, table: str, ts_ms: int, source_type: str = "mysql"
) -> DataFrame:
    """Deleted-key rows → DELETE envelope rows. The payload carries the
    key plus, when the epoch keysets persist them, the row's LAST-SEEN
    watermark (r12) and the configured context columns' last-observed
    values (r13, polling.keyset.context.columns) — a poller has no final
    row image to report (the same shape as a Debezium tombstone whose
    `before` was trimmed to the configured columns), but "this key, last
    observed at wm=X with these values" lets a downstream
    materialization tombstone with context. latest_image only needs the
    key to retract (operators/cdc with drop_deletes)."""
    from flink_cdc_multi_spark.envelope import OP_DELETE

    env = delta_to_envelope(keys, db, table, None, None, ts_ms, source_type)
    return env.withColumn("_op", F.lit(OP_DELETE))


@dataclass
class PollingSource:
    """Watermark state + readers for every polled table.

    ``reader(db, tbl)`` returns the CURRENT table as a DataFrame — a live
    ``spark.read.jdbc`` relation in deployments (watermark filters push
    down), or a parquet stand-in re-read each poll in this container
    (``polling.standin.path/db.tbl``; no database ships here — the same
    sandbox convention as the Kafka stand-in)."""

    tables: list[tuple[str, str]]  # (db, tbl) raw names
    ts_col: str | None
    pk_col: str | None
    offset_path: str | None = None
    source_type: str = "mysql"
    # "none" | "snapshot-diff": diff each poll's key set against the
    # previous poll's persisted keys (pruned key-only scan → anti-join)
    # and emit DELETE envelopes for keys that vanished. The one CDC event
    # class a watermark poller cannot see otherwise. Requires pk_col and
    # keyset_path. Inherent limits, stated: a row inserted AND deleted
    # between two polls is invisible, and a delete is only observed at
    # poll granularity — log tailing (the Debezium legs) remains the
    # answer when that matters.
    delete_detection: str = "none"
    keyset_path: str | None = None
    # r13: extra columns persisted per epoch so DELETE payloads carry
    # the row's last-observed values (config: polling.keyset.context.
    # columns). Opt-in — each column grows every epoch by width × rows.
    context_cols: list[str] = field(default_factory=list)
    state: dict[str, TableWatermark] = field(default_factory=dict)

    def __post_init__(self):
        if not self.ts_col and not self.pk_col:
            raise ValueError(
                "polling needs polling.key.column and/or polling.watermark.column"
            )
        if self.delete_detection not in ("none", "snapshot-diff"):
            raise ValueError(
                f"unknown polling.delete.detection: {self.delete_detection!r}"
            )
        if self.delete_detection == "snapshot-diff" and (
            not self.pk_col or not self.keyset_path
        ):
            raise ValueError(
                "snapshot-diff delete detection needs polling.key.column "
                "and a keyset path"
            )
        for db, tbl in self.tables:
            self.state.setdefault(f"{db}.{tbl}", TableWatermark())

    def _epoch_dir(self, key: str, epoch: int) -> str:
        return fsio.join(fsio.join(self.keyset_path, key), f"epoch={epoch}")

    def _keyset_cols(self) -> list[str]:
        """Columns persisted per epoch: the key, plus the watermark column
        when configured (r12) — 8-16 bytes/row, column-pruned at the
        source — plus the opt-in context columns (r13), deduplicated so
        a context column that IS the key/watermark is not selected twice
        (duplicate columns fail the parquet write; same rule as the
        ts==pk case). The watermark rides along so a later DELETE can
        report the row's last-seen watermark; context columns ride along
        so it carries the last-observed values too."""
        cols = [self.pk_col]
        if self.ts_col and self.ts_col != self.pk_col:
            cols.append(self.ts_col)
        cols += [c for c in self.context_cols if c not in cols]
        return cols

    def _write_keyset(self, spark_df: DataFrame, key: str, epoch: int) -> None:
        """Persist the epoch key set for the next poll's diff. Parquet
        overwrite is idempotent: a crash between this write and the
        offset commit leaves the state pointing at the previous epoch,
        and the next poll re-diffs against THAT epoch — re-emitting (not
        losing) any DELETE envelopes from the interrupted poll. The
        duplicate-DELETE is the documented at-least-once contract (module
        docstring), same order as the watermark file."""
        spark_df.write.mode("overwrite").parquet(self._epoch_dir(key, epoch))

    def _diff_deletes(self, spark, cur_keys: DataFrame, key: str):
        """prev-epoch keys ANTI JOIN current keys = deleted since the
        last poll; the surviving prev-epoch row carries the key's
        last-seen watermark (when the epoch was written with one) into
        the DELETE payload. Declarative equi-anti-join: AQE broadcasts
        whichever side is small; at scale both sides are key(+wm)-only
        columns. Joins on the key column alone so epochs written by
        older key-only versions still diff cleanly."""
        wm = self.state[key]
        if wm.keys_epoch is None:
            return None
        prev = spark.read.parquet(self._epoch_dir(key, wm.keys_epoch))
        return prev.join(cur_keys.select(self.pk_col), self.pk_col, "left_anti")

    def _cleanup_keysets(self, key: str, keep_from: int) -> None:
        """Drop epoch dirs older than keep_from - 1 (the previous epoch
        stays until the NEXT commit in case the current poll's offset
        write never lands). Local filesystem only; remote stores age out
        via lifecycle rules."""
        import os
        import shutil

        base = fsio.join(self.keyset_path, key)
        if "://" in base or not os.path.isdir(base):
            return
        for name in os.listdir(base):
            if name.startswith("epoch="):
                try:
                    ep = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if ep < keep_from - 1:
                    shutil.rmtree(os.path.join(base, name), ignore_errors=True)

    # -- offset persistence (W2 single-file atomic, JSON of per-table marks)
    def load_offsets(self, offset_value: str | None = None) -> bool:
        """Configured offset.value beats the stored file (reference
        precedence, FlinkCDCMulti.java:190-193). Returns True if any
        state was restored."""
        text = offset_value
        if text is None and self.offset_path:
            text = fsio.read_text(self.offset_path)
        if not text:
            return False
        data = json.loads(text)
        for key, d in data.items():
            self.state[key] = TableWatermark.from_dict(d)
        return True

    def save_offsets(self) -> None:
        if self.offset_path:
            fsio.write_text_atomic(
                self.offset_path,
                json.dumps({k: w.to_dict() for k, w in self.state.items()}),
            )

    def seed_from_timestamp(self, datetime_offset: str) -> None:
        """startup.mode=timestamp: poll only rows past the given ISO
        datetime (MySQLStreamer.java:240-251 analogue)."""
        for wm in self.state.values():
            wm.ts, wm.ts_type = datetime_offset, "timestamp"

    def seed_latest(self, reader) -> None:
        """startup.mode=latest: observe the current max watermark of every
        table so the first poll emits only rows arriving AFTER startup."""
        for db, tbl in self.tables:
            key = f"{db}.{tbl}"
            self.state[key] = observe_watermark(
                reader(db, tbl), self.ts_col, self.pk_col, self.state[key]
            )

    def poll(
        self, reader, ts_ms: int
    ) -> tuple[DataFrame | None, dict, list[DataFrame]]:
        """One poll across all tables: union of per-table envelope deltas
        (None if every table is quiet), the POST-poll state, and the
        persisted per-table frames the union is built on — the caller
        commits the batch through the pipeline FIRST, persists the state
        after (at-least-once, same order as ST4), then unpersists the
        returned frames (unpersisting the union alone would leak them)."""
        parts, cached, new_state = [], [], {}
        for db, tbl in self.tables:
            key = f"{db}.{tbl}"
            wm = self.state[key]
            delta = delta_filter(reader(db, tbl), self.ts_col, self.pk_col, wm)
            # one pass over the (pushdown-bounded) delta: cache so the
            # watermark aggregate and the envelope write share the scan
            # (on a live JDBC source, one remote query instead of two)
            delta = delta.persist()
            new_wm = observe_watermark(delta, self.ts_col, self.pk_col, wm)
            moved = (new_wm.ts, new_wm.pk) != (wm.ts, wm.pk)
            if moved:
                cached.append(delta)
                parts.append(
                    delta_to_envelope(delta, db, tbl, self.pk_col, wm.pk, ts_ms,
                                      self.source_type)
                )
            else:
                delta.unpersist()
            if self.delete_detection == "snapshot-diff":
                # key(+wm)-only re-read (column-pruned at the source; NB
                # the delta scan and the key scan are two reads of a LIVE
                # table — poll-granularity consistency, the standard
                # polling contract)
                kcols = self._keyset_cols()
                cur_keys = reader(db, tbl).select(*kcols).persist()
                deleted = self._diff_deletes(cur_keys.sparkSession, cur_keys, key)
                n_del = deleted.count() if deleted is not None else 0
                if n_del:
                    parts.append(
                        deletes_to_envelope(deleted, db, tbl, ts_ms,
                                            self.source_type)
                    )
                if moved or n_del or wm.keys_epoch is None:
                    epoch = (wm.keys_epoch if wm.keys_epoch is not None else -1) + 1
                    epoch_keys = cur_keys
                    if moved:
                        # ghost-row fix (ADVICE r11): every row EMITTED
                        # downstream must be diffable — a delta row
                        # deleted between the delta scan and the key scan
                        # would otherwise never enter any epoch and its
                        # DELETE would be silently lost. Union the delta's
                        # keys in; a key on both sides keeps ONE row
                        # atomically — max watermark, current-scan
                        # preferred on ties — so wm and context columns
                        # (r13) always come from the same observation
                        # (independent per-column max/first could stitch
                        # a wm from one row to context from another).
                        cur_tag = cur_keys.withColumn("_prio", F.lit(1))
                        delta_tag = delta.select(*kcols).withColumn(
                            "_prio", F.lit(0)
                        )
                        u = cur_tag.unionByName(delta_tag)
                        valcols = [c for c in kcols if c != self.pk_col]
                        if not valcols:
                            epoch_keys = u.select(self.pk_col).distinct()
                        else:
                            order = (
                                F.struct(F.col(self.ts_col), F.col("_prio"))
                                if self.ts_col and self.ts_col != self.pk_col
                                else F.col("_prio")
                            )
                            # max_by of the whole value struct: a partial
                            # agg (map-side combine), never a window
                            epoch_keys = u.groupBy(self.pk_col).agg(
                                F.max_by(F.struct(*valcols), order).alias("_v")
                            ).select(self.pk_col, "_v.*")
                    self._write_keyset(epoch_keys, key, epoch)
                    new_wm.keys_epoch = epoch
                    self._cleanup_keysets(key, epoch)
                if n_del:
                    cached.append(cur_keys)  # the delete diff reads it
                else:
                    cur_keys.unpersist()
            new_state[key] = new_wm
        if not parts:
            return None, new_state, []
        env = parts[0]
        for p in parts[1:]:
            env = env.unionByName(p)
        return env, new_state, cached


def run_polling(
    spark: SparkSession,
    cfg,
    pipeline,
    reader=None,
    max_polls: int | None = None,
    interval_s: float | None = None,
) -> int:
    """Drive the polling loop through an existing CDCPipeline: snapshot
    (startup.mode=initial) then repeated deltas, each committed via
    ``pipeline.process_batch`` BEFORE the watermark file advances
    (at-least-once: a crash between the two replays the delta, never
    loses it). Returns the number of polls executed."""
    from flink_cdc_multi_spark.sources.jdbc import snapshot_to_envelope

    # same startup hygiene as the streaming leg: a crash mid-staging in a
    # previous polling process (per-instance publish tag, never replayed)
    # leaves orphaned .staging_b* dirs no one else will clean
    pipeline._sweep_stale_staging(spark)

    raw = cfg.raw
    ts_col = raw.get("polling.watermark.column")
    pk_col = raw.get("polling.key.column")
    if reader is None:
        reader = make_reader(spark, cfg)
    tables = [tuple(t.split(".", 1)) for t in cfg.source_table_list]
    # offset.store.path is a DIRECTORY (OffsetFileStore convention); the
    # watermark state is one more single-file store inside it, beside the
    # log-offset and stop-controller files
    wm_path = (
        fsio.join(cfg.offset_store_path, f"{cfg.source_id}_polling.json")
        if cfg.offset_store_path
        else None
    )
    delete_detection = raw.get("polling.delete.detection", "none")
    keyset_path = raw.get("polling.keyset.path")
    if delete_detection != "none" and not keyset_path and cfg.offset_store_path:
        keyset_path = fsio.join(
            cfg.offset_store_path, f"{cfg.source_id}_keysets"
        )
    context_cols = [
        c.strip()
        for c in raw.get("polling.keyset.context.columns", "").split(",")
        if c.strip()
    ]
    source = PollingSource(
        tables,
        ts_col,
        pk_col,
        offset_path=wm_path,
        source_type=cfg.source_type,
        delete_detection=delete_detection,
        keyset_path=keyset_path,
        context_cols=context_cols,
    )
    resumed = source.load_offsets(cfg.offset_value)
    batch_id = 0
    if not resumed:
        if cfg.startup_mode == "initial":
            for db, tbl in tables:
                full = reader(db, tbl).persist()
                env = snapshot_to_envelope(full, db, tbl, _now_ms())
                pipeline.process_batch(env, batch_id)
                batch_id += 1
                key = f"{db}.{tbl}"
                source.state[key] = observe_watermark(
                    full, ts_col, pk_col, source.state[key]
                )
                if source.delete_detection == "snapshot-diff":
                    # seed epoch 0 from the snapshot itself so a delete
                    # between snapshot and first poll is still observed
                    source._write_keyset(
                        full.select(*source._keyset_cols()), key, 0
                    )
                    source.state[key].keys_epoch = 0
                full.unpersist()
            source.save_offsets()
        elif cfg.startup_mode == "latest":
            source.seed_latest(reader)
            source.save_offsets()
        elif cfg.startup_mode == "timestamp":
            if not cfg.datetime_offset:
                raise ValueError("startup.mode=timestamp needs datetime.offset")
            if not ts_col:
                raise ValueError(
                    "startup.mode=timestamp polling needs polling.watermark.column"
                )
            source.seed_from_timestamp(cfg.datetime_offset)
        # startup.mode=offset with no offset.value/file: poll from empty
        # watermarks == earliest (full backfill through the c/u path)
    polls = 0
    interval = interval_s if interval_s is not None else float(
        raw.get("polling.interval.s", 10)
    )
    limit = max_polls if max_polls is not None else raw.get("polling.max.polls")
    limit = int(limit) if limit is not None else None
    while limit is None or polls < limit:
        if polls and interval > 0:
            time.sleep(interval)
        env, new_state, cached = source.poll(reader, _now_ms())
        if env is not None:
            try:
                pipeline.process_batch(env, batch_id)
                batch_id += 1
            finally:
                for c in cached:
                    c.unpersist()
        source.state = new_state
        source.save_offsets()
        polls += 1
        if pipeline.controller.stop_requested:
            break
    return polls


def make_reader(spark: SparkSession, cfg):
    """Reader factory: parquet stand-in (``polling.standin.path``) in this
    container, live JDBC (``source.hostname``) in deployments."""
    raw = cfg.raw
    standin = raw.get("polling.standin.path")
    if standin:
        return lambda db, tbl: spark.read.parquet(f"{standin}/{db}.{tbl}")
    if raw.get("source.hostname"):
        from flink_cdc_multi_spark.__main__ import _JDBC_SCHEMES

        url = "{}://{}:{}/{}".format(
            _JDBC_SCHEMES[cfg.source_type],
            raw["source.hostname"],
            raw.get("source.port", 3306),
            "",
        )

        def jdbc_reader(db: str, tbl: str) -> DataFrame:
            return (
                spark.read.format("jdbc")
                .options(
                    url=url,
                    dbtable=f"{db}.{tbl}",
                    user=raw.get("source.username", ""),
                    password=raw.get("source.password", ""),
                    fetchsize=str(raw.get("polling.fetch.size", 1024)),
                )
                .load()
            )

        return jdbc_reader
    raise ValueError(
        "polling needs polling.standin.path (sandbox) or source.hostname (live)"
    )


def _now_ms() -> int:
    return int(time.time() * 1000)

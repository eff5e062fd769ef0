"""Watermarked windowed aggregations over the CDC envelope — the
Structured-Streaming-native piece the reference has no equivalent for (its
stores are global running counters flushed on checkpoint,
java/processfunctions/*StatusStoreProcessFunction; SURVEY.md §2.6 ST8).
These operators give per-window, late-data-aware rollups instead:

- ``windowed_table_counts``: tumbling-window per-(db, table) change
  volumes — the time-series generalization of the status store's single
  running ``record_count``.
- ``session_change_bursts``: gap-based session windows per table via
  ``F.session_window`` — "burst" detection over the change stream (a
  session = a run of changes with no gap longer than ``gap``).

Both carry a watermark so state is BOUNDED: windows finalize (and emit,
in append mode) once the watermark passes their end, and events later
than the watermark are dropped instead of growing state forever — the
exact knob a 100 TB stream needs and a driver-side dict can never give.

Scale: these are plain groupBy aggregations — partial aggregation
map-side, shuffle keyed by (window, db, tbl); state store size is
O(open windows × tables), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(
    envelope: DataFrame, ts_col: str = "_ts", out_col: str = "event_time"
) -> DataFrame:
    """Envelope epoch-millis ``_ts`` → TimestampType event-time column."""
    return envelope.withColumn(out_col, F.timestamp_millis(F.col(ts_col)))


def windowed_table_counts(
    envelope: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window change volumes per (db, table): count per op kind +
    max offset ts. Append-mode emits a row per (window, db, tbl) once the
    watermark passes the window end; later events are dropped (bounded
    state)."""
    ev = with_event_time(envelope).withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.window("event_time", window), "_db", "_tbl")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("_op") == "INSERT", 1)).alias("n_insert"),
            F.count(F.when(F.col("_op") == "UPDATE", 1)).alias("n_update"),
            F.count(F.when(F.col("_op") == "DELETE", 1)).alias("n_delete"),
            F.max("_ts").alias("max_ts"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "_db",
            "_tbl",
            "n",
            "n_insert",
            "n_update",
            "n_delete",
            "max_ts",
        )
    )


def session_change_bursts(
    envelope: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Session windows per (db, table): a burst = consecutive changes with
    no inter-event gap longer than ``gap`` (F.session_window merges
    overlapping gap-extended intervals; the window closes — and emits —
    once the watermark passes last_event + gap)."""
    ev = with_event_time(envelope).withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.session_window("event_time", gap), "_db", "_tbl")
        .agg(F.count("*").alias("n"), F.min("_ts").alias("first_ts"), F.max("_ts").alias("last_ts"))
        .select(
            F.col("session_window.start").alias("burst_start"),
            F.col("session_window.end").alias("burst_end"),
            "_db",
            "_tbl",
            "n",
            "first_ts",
            "last_ts",
        )
    )

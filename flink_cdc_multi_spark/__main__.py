"""CLI entry point — the reference's front door (FlinkCDCMulti.java:393-415:
``-c/--config <json>``, ``-n/--name``, ``--debug``).

    python -m flink_cdc_multi_spark --config job.json [--name NAME] [--debug]
                                    [--validate] [--timeout SECONDS]

The registry comes from (in order): a ``catalog.file`` parquet of
information_schema-shaped rows (feed-based runs, tests), or live JDBC
introspection from ``source.hostname``/``source.port`` (real deployments).
The change feed comes from ``feed.path`` (Debezium-JSON lines dir — the
sandboxed stand-in for a live binlog client; sources/kafka.py is the
Kafka-Connect shape)."""

from __future__ import annotations

import argparse
import sys

from flink_cdc_multi_spark.config import ConfigError, JobConfig
from flink_cdc_multi_spark.streaming.pipeline import CDCPipeline

_JDBC_SCHEMES = {"mysql": "jdbc:mysql", "postgres": "jdbc:postgresql", "oracle": "jdbc:oracle:thin"}


def _build_mongo_registry(cfg: JobConfig):
    """Mongo has no information_schema: schemas come from document sampling
    (MongoDBStreamer.java:283-295). Feed-based runs supply the samples via
    ``mongodb.sample.file`` — a JSON object {"db.collection": [docs...]};
    live runs need pymongo (sources/mongo.live_sample_docs, gated)."""
    import json

    from flink_cdc_multi_spark.catalog import TableRegistry, infer_mongo_schema

    sample_file = cfg.raw.get("mongodb.sample.file")
    if not sample_file:
        raise ConfigError(
            "source.type=mongodb: JDBC catalog introspection does not apply; "
            "set mongodb.sample.file ({'db.collection': [sample docs]} JSON) "
            "or use the live sampling path (requires pymongo)"
        )
    with open(sample_file) as f:
        samples = json.load(f)
    mode = cfg.mongodb_deserialization_mode
    tables = {}
    for key, docs in samples.items():
        db, _, coll = key.partition(".")
        schema, warnings = infer_mongo_schema(docs, mode=mode)
        for w in warnings:
            print(f"warning: {key}: {w}", file=sys.stderr)
        tables[(db, coll)] = schema

    registry = TableRegistry.build(
        "mongodb",
        tables,
        database_name_map=cfg.database_name_map,
        table_name_map=cfg.table_name_map,
        fail_on_unknown_tables=cfg.fail_on_unknown_tables,
        mongo_mode=mode,
    )

    # the resolver is called with SANITIZED envelope names — index the
    # sample file by the same normalization or adoption silently misses
    # any collection whose name changes under sanitization
    from flink_cdc_multi_spark.functions.sanitizer import sanitize

    sanitized_samples = {
        f"{sanitize(k.partition('.')[0])}.{sanitize(k.partition('.')[2])}": docs
        for k, docs in samples.items()
    }

    def provider(db: str, tbl: str):
        docs = sanitized_samples.get(f"{sanitize(db)}.{sanitize(tbl)}")
        if not docs:
            return None
        return infer_mongo_schema(docs, mode=mode)[0]

    return registry, provider


def _build_registry(spark, cfg: JobConfig):
    from flink_cdc_multi_spark.sources.introspect import (
        DataFrameCatalogReader,
        JdbcCatalogReader,
        build_registry_from_catalog,
        introspect_schema,
    )

    if cfg.source_type == "mongodb":
        return _build_mongo_registry(cfg)
    catalog_file = cfg.raw.get("catalog.file")
    if catalog_file:
        reader = DataFrameCatalogReader(spark.read.parquet(catalog_file))
    elif cfg.raw.get("source.hostname"):
        url = "{}://{}:{}/".format(
            _JDBC_SCHEMES[cfg.source_type],
            cfg.raw["source.hostname"],
            cfg.raw.get("source.port", 3306),
        )
        reader = JdbcCatalogReader(
            spark,
            cfg.source_type,
            url,
            cfg.raw.get("source.username", ""),
            cfg.raw.get("source.password", ""),
        )
    else:
        raise ConfigError(
            "no catalog source: set catalog.file (information_schema parquet) "
            "or source.hostname for live JDBC introspection"
        )
    registry = build_registry_from_catalog(
        cfg.source_type,
        reader,
        cfg.source_table_list,
        cfg.raw.get("schema.mode", "compat"),
        database_name_map=cfg.database_name_map,
        table_name_map=cfg.table_name_map,
        fail_on_unknown_tables=cfg.fail_on_unknown_tables,
        mongo_mode=cfg.mongodb_deserialization_mode,
    )

    def provider(db: str, tbl: str):
        try:
            return introspect_schema(cfg.source_type, reader, db, tbl)
        except ValueError:
            return None

    return registry, provider


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="flink_cdc_multi_spark")
    parser.add_argument("-c", "--config", required=True, help="Path to config JSON file")
    parser.add_argument("-n", "--name", help="Job name")
    parser.add_argument("--debug", action="store_true", help="Enable debug print sink")
    parser.add_argument(
        "--validate",
        action="store_true",
        help="Build the registry, print the table plan, exit",
    )
    parser.add_argument(
        "--timeout", type=float, default=None, help="Stop after N seconds (tests/demos)"
    )
    args = parser.parse_args(argv)

    cfg = JobConfig.load(args.config)
    if args.name:
        cfg.job_name = args.name
    if args.debug:
        cfg.debug = True

    from flink_cdc_multi_spark.session import get_spark

    spark = get_spark(cfg.job_name or f"JOB-{cfg.source_id}")
    registry, provider = _build_registry(spark, cfg)
    print(f"job: {cfg.job_name or cfg.source_id} source={cfg.source_type}")
    for key in sorted(registry.specs):
        print(f"  table: {key}")
    if args.validate:
        return 0

    # Transport selection (README "Deployment topology"): a Kafka topic fed
    # by Debezium Server / Kafka Connect (kafka.bootstrap.servers +
    # kafka.topics), the file-backed Kafka stand-in (kafka.standin.path —
    # same consumer code path, no broker socket), the plain Debezium-JSON
    # file feed (feed.path), or high-watermark delta POLLING straight off
    # the source tables (incremental.mode=polling — the no-Debezium path;
    # sources/polling.py documents the c/u-only contract).
    feed = cfg.raw.get("feed.path")
    kafka_servers = cfg.raw.get("kafka.bootstrap.servers")
    kafka_standin = cfg.raw.get("kafka.standin.path")
    polling = cfg.raw.get("incremental.mode") == "polling"
    transports = [t for t in (feed, kafka_servers, kafka_standin, polling) if t]
    if len(transports) != 1:
        raise ConfigError(
            "exactly ONE transport required: feed.path (Debezium-JSON lines "
            "dir), kafka.bootstrap.servers + kafka.topics (live topic), "
            "kafka.standin.path (file-backed Kafka stand-in), or "
            "incremental.mode=polling (watermark deltas off the live tables)"
        )
    if polling:
        from flink_cdc_multi_spark.sources.polling import run_polling

        pipe = CDCPipeline(cfg, registry, schema_provider=provider)
        timeout_polls = None
        if args.timeout is not None:
            # bounded run (tests/demos): translate the deadline into a
            # poll budget at the configured cadence, minimum one poll
            interval = float(cfg.raw.get("polling.interval.s", 10))
            timeout_polls = max(1, int(args.timeout / max(interval, 0.001)))
        polls = run_polling(spark, cfg, pipe, max_polls=timeout_polls)
        print(f"stopped: {pipe.controller.stop_reason or f'{polls} polls done'}")
        return 0
    input_path, input_stream = feed, None
    if kafka_servers:
        from flink_cdc_multi_spark.sources.kafka import read_kafka_stream

        topics = cfg.raw.get("kafka.topics")
        if not topics:
            raise ConfigError("kafka.bootstrap.servers set but kafka.topics missing")
        input_stream = read_kafka_stream(
            spark,
            kafka_servers,
            topics,
            cfg.source_type,
            starting_offsets=cfg.raw.get("kafka.starting.offsets", "earliest"),
            # a topic produced by Kafka Connect's DEFAULT JsonConverter is
            # wrapped in {"schema","payload"} — without this flag the decode
            # silently yields all-null envelopes (VERDICT r15 item 2)
            schemas_enable=cfg.schemas_enable,
        )
    elif kafka_standin:
        from flink_cdc_multi_spark.sources.kafka import read_kafka_stream_standin

        input_stream = read_kafka_stream_standin(
            spark, kafka_standin, cfg.source_type,
            schemas_enable=cfg.schemas_enable,
        )
    pipe = CDCPipeline(cfg, registry, schema_provider=provider)
    ckpt = cfg.checkpoint_directory or f"{cfg.sink_path.rstrip('/')}/_checkpoint"
    query = pipe.start(spark, input_path, ckpt, input_stream=input_stream)
    if args.timeout is not None:
        # bounded run: drain whatever the feed has, then stop (tests/demos)
        query.processAllAvailable()
        query.stop()
        reason = pipe.controller.stop_reason
    else:
        reason = pipe.run_until_stopped(query)
    print(f"stopped: {reason or 'feed drained'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

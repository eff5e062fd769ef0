"""Kafka delivery for the Debezium-JSON feed (the reference embeds the CDC
client in-process; the standard Spark deployment reads the same Debezium
envelope from a Kafka topic populated by Kafka Connect).

The Kafka integration jar (`spark-sql-kafka-0-10`) is not in this
container, so the readers are gated; the value-decoding transform
(`kafka_values_to_envelope`) is pure DataFrame logic and unit-tested with a
stand-in frame shaped like Kafka's output (key/value binary, topic,
partition, offset, timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_multi_spark.sources.debezium_json import decode_raw


class KafkaSupportMissing(RuntimeError):
    pass


def kafka_values_to_envelope(kafka_df: DataFrame, source_type: str,
                             schemas_enable: bool = False) -> DataFrame:
    """Kafka record frame → CDC envelope. The Kafka (topic, partition,
    offset) triple is retained as ``_kafka_*`` columns — a second monotone
    resume key alongside the source-native offsets. ``schemas_enable``:
    unwrap the JsonConverter schema envelope (the Kafka Connect DEFAULT
    — see decode_raw)."""
    return decode_raw(
        kafka_df.select(
            F.col("value").cast("string").alias("value"),
            F.col("topic").alias("_kafka_topic"),
            F.col("partition").alias("_kafka_partition"),
            F.col("offset").alias("_kafka_offset"),
        ),
        source_type,
        passthrough=("_kafka_topic", "_kafka_partition", "_kafka_offset"),
        schemas_enable=schemas_enable,
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    source_type: str,
    starting_offsets: str = "earliest",
    schemas_enable: bool = False,
) -> DataFrame:
    """readStream.format('kafka') → envelope. Raises KafkaSupportMissing
    when the integration jar is absent (this container).
    ``schemas_enable``: the topic was produced by Kafka Connect's DEFAULT
    JsonConverter (value.converter.schemas.enable=true) — unwrap the
    {"schema","payload"} envelope (decode_raw)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # jar missing → AnalysisException at load
        raise KafkaSupportMissing(
            "spark-sql-kafka-0-10 not on the classpath; add the package or "
            "use the file feed (sources/debezium_json.read_raw_stream)"
        ) from exc
    return kafka_values_to_envelope(raw, source_type,
                                    schemas_enable=schemas_enable)


# Kafka's fixed source schema (Structured Streaming Kafka integration docs):
# every consumer-side transform in this repo is written against this shape.
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

# JSON wire shape for the file-backed stand-in (binary carried as strings)
_STANDIN_JSON_SCHEMA = (
    "key string, value string, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def read_kafka_stream_standin(
    spark: SparkSession,
    path: str,
    source_type: str,
    max_files_per_trigger: int | None = None,
    schemas_enable: bool = False,
) -> DataFrame:
    """Container-limit fallback for ``read_kafka_stream``: a directory of
    JSON-lines files where each record carries Kafka's consumer fields
    (topic/partition/offset/key/value/timestamp). The stream is cast to the
    EXACT schema ``readStream.format("kafka")`` produces
    (KAFKA_RECORD_SCHEMA), then decoded by the same
    ``kafka_values_to_envelope`` transform — so everything downstream of
    ``.load()`` (decode, routing, offset store, resume) runs the production
    Kafka code path. The only thing not exercised is the broker socket
    itself (the integration jar is absent in this container; see
    tests/test_kafka_pipeline_e2e.py which pins schema equivalence)."""
    reader = spark.readStream.schema(_STANDIN_JSON_SCHEMA)
    if max_files_per_trigger is not None:
        # loud rejection, consistent with CDCPipeline.start's trigger
        # validation — a caller-supplied 0 must not silently mean
        # "unbounded trigger"
        if max_files_per_trigger <= 0:
            raise ValueError(
                f"max_files_per_trigger must be >= 1, got {max_files_per_trigger}"
            )
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(path).select(
        F.col("key").cast("binary"),
        F.col("value").cast("binary"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        "timestampType",
    )
    return kafka_values_to_envelope(raw, source_type,
                                    schemas_enable=schemas_enable)

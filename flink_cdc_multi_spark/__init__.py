"""flink_cdc_multi_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference `dz902/flink-cdc-multi`
(a Flink 1.17 CDC multi-table ingestion job), rebuilt Spark-first.

Layout (see SURVEY.md §7):

- ``session``     SparkSession factory (UTC, AQE, local tuning)
- ``envelope``    CDC change-event envelope schema + op semantics (§1.5)
- ``catalog``     type maps + schema registry + Mongo-style inference (§1.3/1.4)
- ``sources``     debezium-JSON feeds, JDBC snapshot, offset grammar (§2.1)
- ``operators``   routing, DDL classifier, stop control, CDC materialize,
                  dedup / similarity / text / multimodal extensions (§2.4-2.11)
- ``functions``   scalar helpers: sanitizer, datetime, resume-token decoder (§2.9)
- ``plans``       the declared query surface q01-q17 + extensions (§2.12)
- ``streaming``   structured-streaming pipeline: foreachBatch router,
                  offset store, status store (§3)
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

from flink_cdc_multi_spark.plans.queries import QUERIES, load_table
from flink_cdc_multi_spark.plans.oracle import ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL", "load_table"]

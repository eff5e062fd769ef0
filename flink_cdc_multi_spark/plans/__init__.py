from flink_cdc_multi_spark.plans.extensions import EXT_ORACLE_SQL, EXT_QUERIES
from flink_cdc_multi_spark.plans.oracle import ORACLE_SQL
from flink_cdc_multi_spark.plans.queries import QUERIES, load_table

ALL_QUERIES = {**QUERIES, **EXT_QUERIES}
ALL_ORACLE_SQL = {**ORACLE_SQL, **EXT_ORACLE_SQL}

__all__ = [
    "QUERIES",
    "EXT_QUERIES",
    "ALL_QUERIES",
    "ORACLE_SQL",
    "EXT_ORACLE_SQL",
    "ALL_ORACLE_SQL",
    "load_table",
]

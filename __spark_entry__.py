"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-shaped q14) on sf0.001.
``queries()`` — every implemented operator/query from SURVEY.md §2.
``oracle_sql()`` — matching DuckDB SQL (omitted for non-SQL-expressible ops;
those get the driver's weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL, ALL_QUERIES
from flink_cdc_multi_spark.session import configure_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return ALL_QUERIES["q14"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key — since round 6 EVERY
    registered query has one (the former rows-only xxhash64
    minhash/simhash entries became banded-LSH pair queries over portable
    md5-hash60 signatures; the xxhash64 operators remain as non-gated
    fast paths pinned against them in tests). Hyperplane-LSH, IVF, PNG
    pixel decode, and the shingle distinct counts are oracle-checked via
    engine-portable arithmetic (md5-parity planes, integer quantization,
    closed-form pixel sums, md5-hash60 distinct)."""
    out = dict(ALL_ORACLE_SQL)
    # pid-scoped artifact paths must be rendered in the EVALUATING process
    # (ADVICE r14: a fork-after-import harness otherwise reads a parent-pid
    # path that doesn't exist)
    from flink_cdc_multi_spark.plans.extensions import LAZY_ORACLE_SQL

    for name, render in LAZY_ORACLE_SQL.items():
        out[name] = render()
    return out

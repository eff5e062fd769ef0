"""r17 wave 4 same-session ABAB probe (guide §1 + repo methodology):
one Spark session, alternated variants, median-of-N — never cross-JVM.

Wave 4 (guide §2.3 aggregate-before-expand): Catalyst compiles
rollup(a, b) to an Expand — a |levels|× fan-out of its INPUT. The old
forms rolled up the raw lineitem scan (Expand over |lineitem| rows);
the shipped forms aggregate to the (flag, status) base first and roll
the base up (Expand over |groups| rows, one extra group-count-sized
exchange).

  A = pre-change form (reconstructed inline): rollup over the raw scan
  B = shipped code (plans.extensions.ext_rollup_agg / plans.queries.q30)

Result equality is asserted on full sorted collects (≤ ~20 rows) before
any timing is trusted.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flink_cdc_multi_spark.plans import ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def old_rollup_agg(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


def old_q30(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev_c = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        * F.lit(100) + F.lit(0.5)
    ).cast("bigint")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            rev_c.alias("rev_c"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("qty").cast("bigint").alias("sum_qty"),
            F.sum("rev_c").cast("bigint").alias("sum_rev_cents"),
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ABAB_ROUNDS", "4"))
    spark = get_spark("opt_r17_abab_w4",
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16m"})
    sc = spark.sparkContext

    def run(df: DataFrame, tag: str) -> tuple[float, int]:
        g = f"{tag}-{time.monotonic_ns()}"
        sc.setJobGroup(g, tag)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(g))
        sc.setJobGroup("", "")
        return dt, jobs

    for name, old_fn in (("ext_rollup_agg", old_rollup_agg),
                         ("q30", old_q30)):
        dfa = old_fn(spark, sf_dir)
        dfb = ALL_QUERIES[name](spark, sf_dir)
        nullsafe = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
        ra = sorted(map(tuple, dfa.collect()), key=nullsafe)
        rb = sorted(map(tuple, dfb.collect()), key=nullsafe)
        print(f"{name} results equal: {ra == rb} ({len(rb)} rows)", flush=True)
        assert ra == rb, f"{name}: result mismatch"
        run(dfa, "warmA"); run(dfb, "warmB")
        ta, tb, ja, jb = [], [], None, None
        for _ in range(rounds):
            dt, ja = run(dfa, "A"); ta.append(dt)
            dt, jb = run(dfb, "B"); tb.append(dt)
            dt, jb = run(dfb, "B"); tb.append(dt)
            dt, ja = run(dfa, "A"); ta.append(dt)
        print(f"{name} OLD (rollup-raw)  median {statistics.median(ta):.3f}s "
              f"jobs {ja} {sorted(round(t, 3) for t in ta)}")
        print(f"{name} NEW (pre-agg)     median {statistics.median(tb):.3f}s "
              f"jobs {jb} {sorted(round(t, 3) for t in tb)}")


if __name__ == "__main__":
    main()

"""q27/q28 bucketed-layout experiment at sf10 (r10; extends the r9/r10
measured-rejection table for the two remaining weak fact-fact joins).

q27 (TPC-H Q7 shape) and q28 (Q12 shape) carry NO lineitem date
predicate, so the dt=YYYY-MM layout lever measured for q24/q25 is
inapplicable (they are q25's full-scan class, where 83 small month files
LOSE row-group locality). Their residual vs DuckDB is the orderkey
fact-fact shuffle: Spark materializes both exchanges; DuckDB pipelines
in-process. The production lever for exactly this shape is the one the
brief names — BUCKETING: store both facts bucketed by orderkey
(`bucketBy(32).sortBy` one file per bucket), and the orderkey join needs
no exchange and no sort at all; a 100 TB deployment would lay out its
fact tables this way precisely because every downstream join re-uses the
co-partitioning for free.

    python tools/layout_bucketed_join.py /tmp/sf10

Interleaved min-of-3 in ONE session per variant x layout; results
asserted identical across layouts; DuckDB runs the registered oracle SQL
on its own single-file best case (subprocess, same methodology as
tools/sweep_sf10_ext.py). Gate queries keep reading the driver fixture —
this experiment decides the documented lake-layout recommendation only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators.bucketing import register_bucketed  # noqa: E402
from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table, q27_plan  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402
from sweep_sf10_ext import duck_run  # noqa: E402

BUCKETS = 32
WAREHOUSE = os.environ.get("BUCKET_WAREHOUSE", "/tmp/wh_bucketed")


def build_layout(spark, src: str) -> None:
    """Materialize lineitem + orders bucketed by orderkey, one sorted
    file per bucket (repartition to bucket count first — multiple files
    per bucket would force a merge sort back into the read path)."""
    if os.path.exists(f"{WAREHOUSE}/lineitem_b/_SUCCESS"):
        register_bucketed(spark, "lineitem_b", f"{WAREHOUSE}/lineitem_b",
                          ["l_orderkey"], BUCKETS)
        register_bucketed(spark, "orders_b", f"{WAREHOUSE}/orders_b",
                          ["o_orderkey"], BUCKETS)
        print("bucketed layout exists, re-registered", flush=True)
        return
    li = load_table(spark, src, "lineitem")
    (
        li.repartition(BUCKETS, "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    orders = load_table(spark, src, "orders")
    (
        orders.repartition(BUCKETS, "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    print("bucketed layout built", flush=True)


def q28_on(lineitem, orders, hinted: bool):
    """q28 body (plans/queries.py:747) parameterized by the fact frames;
    hinted=False for the bucketed layout (the hint would force a hash
    build where the co-partitioned SMJ is already exchange- and
    sort-free)."""
    o = orders.select("o_orderkey", "o_orderpriority")
    if hinted:
        o = o.hint("shuffle_hash")
    high = F.coalesce(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"), F.lit(0)
    )
    return (
        lineitem.select("l_orderkey", F.year("l_shipdate").alias("ship_year"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("ship_year").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(high).alias("high_line_count"),
            (F.count("*") - F.sum(high)).alias("low_line_count"),
        )
    )


def q27_on(spark, src: str, lineitem, orders, hinted: bool):
    """q27 body (plans/queries.py:696). Only the lineitem side of the
    orderkey join benefits from bucketing (ord_n is computed, so it
    shuffles regardless; with shuffle partitions == bucket count the
    bucketed lineitem side still avoids its exchange AND its sort)."""
    customer = load_table(spark, src, "customer")
    supplier = load_table(spark, src, "supplier")
    nation = load_table(spark, src, "nation")
    pick = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    sup_n = supplier.join(
        F.broadcast(pick.select(F.col("n_nationkey").alias("snk"),
                                F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation")
    cust_n = customer.join(
        F.broadcast(pick.select(F.col("n_nationkey").alias("cnk"),
                                F.col("n_name").alias("cust_nation"))),
        customer.c_nationkey == F.col("cnk"),
    ).select("c_custkey", "cust_nation")
    ord_n = orders.join(cust_n.hint("shuffle_hash") if hinted else cust_n,
                        orders.o_custkey == cust_n.c_custkey).select(
        "o_orderkey", "cust_nation", F.year("o_orderdate").alias("o_year")
    )
    if hinted:
        sup_n = sup_n.hint("shuffle_hash")
        ord_n = ord_n.hint("shuffle_hash")
    ext_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dh = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    return (
        lineitem.join(sup_n, lineitem.l_suppkey == sup_n.s_suppkey)
        .join(ord_n, lineitem.l_orderkey == ord_n.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.col("o_year").cast("bigint").alias("o_year"),
        )
        .agg(
            F.sum(ext_c * (100 - dh)).alias("volume_u"),
            F.count("*").alias("n_items"),
        )
    )


def q27_on_bucketed_reordered(spark, src: str, lineitem, orders):
    """q27 with the orderkey join FIRST: the shipped join order (suppkey
    join, then orderkey join) shuffles lineitem on l_suppkey immediately,
    destroying the bucket partitioning before it can pay off. Joining
    lineitem_b ⋈ ord_n first keeps lineitem exchange-free (ord_n alone
    shuffles into the 32 matching partitions; shuffle_hash build avoids
    sorts entirely), and only the ~8%-selectivity survivor shuffles on
    l_suppkey for the sup_n join."""
    customer = load_table(spark, src, "customer")
    supplier = load_table(spark, src, "supplier")
    nation = load_table(spark, src, "nation")
    pick = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    sup_n = supplier.join(
        F.broadcast(pick.select(F.col("n_nationkey").alias("snk"),
                                F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation").hint("shuffle_hash")
    cust_n = customer.join(
        F.broadcast(pick.select(F.col("n_nationkey").alias("cnk"),
                                F.col("n_name").alias("cust_nation"))),
        customer.c_nationkey == F.col("cnk"),
    ).select("c_custkey", "cust_nation").hint("shuffle_hash")
    ord_n = orders.join(cust_n, orders.o_custkey == cust_n.c_custkey).select(
        "o_orderkey", "cust_nation", F.year("o_orderdate").alias("o_year")
    ).hint("shuffle_hash")
    ext_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dh = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    return (
        lineitem.join(ord_n, lineitem.l_orderkey == ord_n.o_orderkey)
        .join(sup_n, F.col("l_suppkey") == sup_n.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.col("o_year").cast("bigint").alias("o_year"),
        )
        .agg(
            F.sum(ext_c * (100 - dh)).alias("volume_u"),
            F.count("*").alias("n_items"),
        )
    )


def _time(df, runs=3):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))
    return times


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("bucketed-layout",
                      extra_conf={"spark.sql.warehouse.dir": WAREHOUSE})
    t0 = time.perf_counter()
    build_layout(spark, src)
    build_s = round(time.perf_counter() - t0, 1)

    li_f = load_table(spark, src, "lineitem")
    or_f = load_table(spark, src, "orders")
    li_b = spark.table("lineitem_b")
    or_b = spark.table("orders_b")

    variants = {
        "q28_fixture": q28_on(li_f, or_f, hinted=True),
        "q28_bucketed_smj": q28_on(li_b, or_b, hinted=False),
        "q28_bucketed_shj": q28_on(li_b, or_b, hinted=True),
        "q27_fixture": q27_on(spark, src, li_f, or_f, hinted=True),
        "q27_bucketed_shipped_order": q27_on(spark, src, li_b, or_f, hinted=True),
        "q27_bucketed_reordered": q27_on_bucketed_reordered(spark, src, li_b, or_f),
        # the SHIPPED operator after r11 adoption: q27_plan detects the
        # bucketed lineitem via is_bucketed_on and reorders itself
        "q27_adopted_shipped": q27_plan(
            li_b, or_f,
            load_table(spark, src, "customer"),
            load_table(spark, src, "supplier"),
            load_table(spark, src, "nation"),
        ),
    }
    # correctness across layouts before timing
    ref28 = _rows(variants["q28_fixture"])
    assert ref28 == _rows(variants["q28_bucketed_smj"])
    assert ref28 == _rows(variants["q28_bucketed_shj"])
    ref27 = _rows(variants["q27_fixture"])
    assert ref27 == _rows(variants["q27_bucketed_shipped_order"])
    assert ref27 == _rows(variants["q27_bucketed_reordered"])
    assert ref27 == _rows(variants["q27_adopted_shipped"])
    print("layouts agree on results", flush=True)

    results: dict[str, dict] = {"_layout_build_s": build_s}
    for wave in range(3):  # interleaved: one run per variant per wave
        for name, df in variants.items():
            t = _time(df, runs=1)[0]
            results.setdefault(name, {"times": []})["times"].append(t)
        print(f"wave {wave}: " + json.dumps(
            {k: v["times"][-1] for k, v in results.items() if k[0] != "_"}),
            flush=True)
    duck = {q: duck_run(src, ALL_ORACLE_SQL[q], 3) for q in ("q27", "q28")}
    for name in variants:
        rec = results[name]
        rec["min"] = min(rec["times"])
        dmin = duck[name[:3]].get("min")
        if dmin:
            rec["ratio_vs_duckdb"] = round(rec["min"] / dmin, 2)
    results["q27_duckdb"], results["q28_duckdb"] = duck["q27"], duck["q28"]

    # plan audit: the bucketed q28 SHJ join must have NO exchange below
    # the aggregate (bucket co-partitioning satisfies the join on both
    # sides) and no sorts (hash build, not merge)
    plan = (
        variants["q28_bucketed_shj"]._jdf.queryExecution().executedPlan().toString()
    )
    results["_q28_shj_exchanges"] = plan.count("Exchange hashpartitioning(l_orderkey") \
        + plan.count("Exchange hashpartitioning(o_orderkey")
    results["_q28_shj_sorts"] = plan.count("Sort [")
    print("==== SUMMARY ====")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

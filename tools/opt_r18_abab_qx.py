"""r18 wave 4: ext_quality_expectations RI-leg fusion (VERDICT r17
item 4 — job count, not shuffle volume: 14 AQE stage-jobs at sf0.1).

Variant: the two referential-integrity anti-joins ride ONE tagged-union
anti-join — fact = union(orders.o_custkey tagged 1, lineitem.l_orderkey
tagged 2), dim = union(customer.c_custkey tagged 1, orders.o_orderkey
tagged 2), joined once on (leg, k) with the same shuffle_hash hint the
sf10 audit picked. Violation counts come back as ONE single-row
conditional aggregate (sum(when(leg==i,1))) so a zero-violation leg
still emits its row (a groupBy(leg) would drop it). Same rows, same
bytes shuffled, half the RI stages.

    python tools/opt_r18_abab_qx.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    ext_quality_expectations,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fused(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    def unpivot(agg_df, rules):
        return agg_df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        F.col(ncol).alias("n_checked"),
                        F.col(vcol).alias("n_violations"),
                    )
                    for rule, ncol, vcol in rules
                ])
            ).alias("r")
        ).select("r.*")

    li_agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        viol(~F.col("l_quantity").between(1, 45)).alias("v_qty"),
        viol(F.col("l_discount") > 0.05).alias("v_disc"),
        viol(~F.col("l_returnflag").isin("A", "R")).alias("v_flag"),
    )
    li_rows = unpivot(li_agg, [
        ("range: lineitem.l_quantity in [1,45]", "n", "v_qty"),
        ("range: lineitem.l_discount <= 0.05", "n", "v_disc"),
        ("domain: lineitem.l_returnflag in (A,R)", "n", "v_flag"),
    ])
    o_agg = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        viol(F.col("o_totalprice") < 1000).alias("v_price"),
        viol(F.col("o_orderdate").isNull()).alias("v_null"),
    )
    o_rows = unpivot(o_agg, [
        ("range: orders.o_totalprice >= 1000", "n", "v_price"),
        ("not_null: orders.o_orderdate", "n", "v_null"),
    ])
    c_rows = unpivot(
        cust.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            viol(F.col("c_acctbal") < 0).alias("v_bal"),
            viol(~F.col("c_name").rlike(r"^Customer#[0-9]+\z")).alias("v_name"),
        ),
        [("range: customer.c_acctbal >= 0", "n", "v_bal"),
         ("format: customer.c_name", "n", "v_name")],
    )

    ri_fact = orders.select(
        F.lit(1).alias("leg"), F.col("o_custkey").alias("k")
    ).unionByName(
        li.select(F.lit(2).alias("leg"), F.col("l_orderkey").alias("k"))
    )
    ri_dim = cust.select(
        F.lit(1).alias("leg"), F.col("c_custkey").alias("k")
    ).unionByName(
        orders.select(F.lit(2).alias("leg"), F.col("o_orderkey").alias("k"))
    )
    v_row = (
        ri_fact.join(ri_dim.hint("shuffle_hash"), ["leg", "k"], "left_anti")
        .agg(
            F.coalesce(F.sum(F.when(F.col("leg") == 1, 1)), F.lit(0))
            .cast("bigint").alias("v_ri1"),
            F.coalesce(F.sum(F.when(F.col("leg") == 2, 1)), F.lit(0))
            .cast("bigint").alias("v_ri2"),
        )
    )
    ri_rows = unpivot(
        v_row.crossJoin(o_agg.select(F.col("n").alias("n_o")))
        .crossJoin(li_agg.select(F.col("n").alias("n_li"))),
        [("ri: orders.o_custkey -> customer.c_custkey", "n_o", "v_ri1"),
         ("ri: lineitem.l_orderkey -> orders.o_orderkey", "n_li", "v_ri2")],
    )
    return (
        li_rows.unionByName(o_rows).unionByName(c_rows).unionByName(ri_rows)
    )


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("opt_r18_abab_qx")
    sc = spark.sparkContext

    cur = ext_quality_expectations(spark, SF_DIR)
    new = fused(spark, SF_DIR)
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, f"diverged:\n{a}\n{b}"
    print(f"sf0.1 equality OK ({len(a)} rows): {b}")

    for tag, build in (("sf0.1", SF_DIR), ("sf10", "/tmp/sf10")):
        if not os.path.isdir(build):
            continue
        cur_t = ext_quality_expectations(spark, build)
        new_t = fused(spark, build)
        if tag != "sf0.1":
            ka = sorted(map(tuple, cur_t.collect()))
            kb = sorted(map(tuple, new_t.collect()))
            assert ka == kb, f"{tag} diverged"
            print(f"{tag} equality OK")
        for order in ("AB", "BA"):
            seq = [("cur", cur_t), ("fused", new_t)]
            if order == "BA":
                seq = seq[::-1]
            ts = {"cur": [], "fused": []}
            jobs = {}
            for name, df in seq:
                sc.setJobDescription(f"warm {tag} {name}")
                noop(df)
            for i in range(3):
                for name, df in seq:
                    grp = f"{tag}-{name}-{order}-{i}"
                    sc.setJobGroup(grp, name)
                    ts[name].append(noop(df))
                    jobs[name] = len(
                        sc.statusTracker().getJobIdsForGroup(grp))
                    sc.setJobGroup("", "")
            med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
            print(f"{tag} order {order}: cur med {med['cur']:.3f}s "
                  f"(jobs {jobs['cur']}) fused med {med['fused']:.3f}s "
                  f"(jobs {jobs['fused']}) ratio "
                  f"{med['cur'] / med['fused']:.2f}x  {ts}")


if __name__ == "__main__":
    main()

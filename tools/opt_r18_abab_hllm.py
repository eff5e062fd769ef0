"""r18 wave 7: ext_sketch_hll_merge — n_shards' pruned/elided branch
re-derives the whole tokenize+hash pass (2 scans, 0 ReusedExchange);
the m-guard makes both consumers share the shard_regs exchange
(1 scan, ReusedExchange). Values identical (m >= 1 always).

    python tools/opt_r18_abab_hllm.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import text as X  # noqa: E402
from flink_cdc_multi_spark.operators.sketch import (  # noqa: E402
    hll_finalize,
    hll_j_rho,
)
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    ext_sketch_hll_merge,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def hllm_old(spark, sf_dir):
    """Pre-r18 replica: bare count_distinct(source) branch."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        "lang", "source", F.explode(X.tokens(F.col("text"))).alias("token")
    )
    j, rho = hll_j_rho(F.col("token"), use_xxhash=True)
    shard_regs = (
        toks.select("lang", "source", j.alias("j"), rho.alias("rho"))
        .groupBy("lang", "source", "j")
        .agg(F.max("rho").alias("m"))
    )
    merged = shard_regs.groupBy("lang", "j").agg(F.max("m").alias("m"))
    n_shards = shard_regs.groupBy("lang").agg(
        F.count_distinct("source").cast("bigint").alias("n_shards")
    ).withColumnRenamed("lang", "nsh_lang")
    fin = hll_finalize(merged, ["lang"])
    return fin.join(
        n_shards, fin["lang"].eqNullSafe(n_shards["nsh_lang"])
    ).select(
        "lang", "n_shards", "v_filled", "harmonic_scaled", "est_distinct"
    )


def main() -> None:
    spark = get_spark("opt_r18_abab_hllm")
    sc = spark.sparkContext
    for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf10", "/tmp/sf10")):
        if not os.path.isdir(d):
            continue
        old = hllm_old(spark, d)
        new = ext_sketch_hll_merge(spark, d)
        a = sorted(map(tuple, old.collect()))
        b = sorted(map(tuple, new.collect()))
        assert a == b, f"{tag} diverged: {a} vs {b}"
        print(f"{tag} equality OK ({len(a)} rows)")
        for order in ("AB", "BA"):
            seq = [("old", old), ("new", new)]
            if order == "BA":
                seq = seq[::-1]
            ts = {"old": [], "new": []}
            for name, df in seq:
                sc.setJobDescription(f"warm {tag} {name}")
                df.write.format("noop").mode("overwrite").save()
            for i in range(3):
                for name, df in seq:
                    sc.setJobDescription(f"{tag} {name} {order} r{i}")
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    ts[name].append(round(time.perf_counter() - t0, 3))
            med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
            print(f"{tag} order {order}: old med {med['old']:.3f}s "
                  f"new med {med['new']:.3f}s ratio "
                  f"{med['old'] / med['new']:.2f}x  {ts}")


if __name__ == "__main__":
    main()

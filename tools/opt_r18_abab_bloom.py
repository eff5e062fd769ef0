"""r18 wave 5 (extra): ext_sketch_bloom — broadcast-sketch probe join
(re-derives the corpus token pass under the BroadcastExchange: 3 scans,
2 full tokenize+position chains) vs the shipped shuffle-join +
sketch-barrier form (one corpus pass, ReusedExchange).

    python tools/opt_r18_abab_bloom.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import text as X  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import ext_sketch_bloom  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def bloom_old(spark, sf_dir):
    """Pre-r18 replica: F.broadcast(sketch) probe join."""
    from flink_cdc_multi_spark.operators.sketch import (
        BLOOM_K,
        BLOOM_M,
        BLOOM_WORD,
        bloom_h1_h2,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.trim("text") != "")
    toks = base.select(
        "lang", F.explode(X.tokens(F.col("text"))).alias("token")
    )

    def positions(df):
        h1, h2 = bloom_h1_h2(F.col("token"))
        pos = F.explode(
            F.array(*[((h1 + F.lit(i) * h2) % BLOOM_M) for i in range(BLOOM_K)])
        ).alias("p")
        return df.select(*df.columns, pos).select(
            *df.columns,
            F.expr(f"p div {BLOOM_WORD}").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(p % {BLOOM_WORD} AS INT))").alias("mask"),
        )

    sketch = (
        positions(toks.select("lang", "token"))
        .groupBy("lang", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    nb = sketch.groupBy("lang").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_bits_set")
    )
    probes = (
        base.filter(F.col("doc_id") < 5)
        .select(F.explode(X.tokens(F.col("text"))).alias("token"))
        .distinct()
    )
    n_probes = probes.agg(F.count("*").cast("bigint").alias("n_probes"))
    hits = (
        positions(probes)
        .join(F.broadcast(sketch), "word")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("nhit"))
        .filter(F.col("nhit") == BLOOM_K)
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_probe_hits"))
        .withColumnRenamed("lang", "h_lang")
    )
    return (
        nb.join(hits, nb["lang"].eqNullSafe(hits["h_lang"]), "left")
        .crossJoin(F.broadcast(n_probes))
        .select(
            "lang", "n_bits_set",
            F.coalesce(F.col("n_probe_hits"), F.lit(0).cast("bigint"))
            .alias("n_probe_hits"),
            "n_probes",
        )
    )


def main() -> None:
    spark = get_spark("opt_r18_abab_bloom")
    sc = spark.sparkContext
    for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf10", "/tmp/sf10")):
        if not os.path.isdir(d):
            continue
        old = bloom_old(spark, d)
        new = ext_sketch_bloom(spark, d)
        a = sorted(map(tuple, old.collect()))
        b = sorted(map(tuple, new.collect()))
        assert a == b, f"{tag} diverged: {a} vs {b}"
        print(f"{tag} equality OK ({len(a)} rows)")
        for order in ("AB", "BA"):
            seq = [("old", old), ("new", new)]
            if order == "BA":
                seq = seq[::-1]
            ts = {"old": [], "new": []}
            jobs = {}
            for name, df in seq:
                sc.setJobDescription(f"warm {tag} {name}")
                df.write.format("noop").mode("overwrite").save()
            for i in range(3):
                for name, df in seq:
                    grp = f"{tag}-{name}-{order}-{i}"
                    sc.setJobGroup(grp, name)
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    ts[name].append(round(time.perf_counter() - t0, 3))
                    jobs[name] = len(sc.statusTracker().getJobIdsForGroup(grp))
                    sc.setJobGroup("", "")
            med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
            print(f"{tag} order {order}: old med {med['old']:.3f}s "
                  f"(jobs {jobs['old']}) new med {med['new']:.3f}s "
                  f"(jobs {jobs['new']}) ratio "
                  f"{med['old'] / med['new']:.2f}x  {ts}")


if __name__ == "__main__":
    main()

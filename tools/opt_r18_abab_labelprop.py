"""r18 wave 1: labelprop iteration fold (VERDICT r17 item 1).

Candidate: replace each round's two-aggregate chain
(groupBy(v,nl).count -> groupBy(v).max(struct(c,-nl))) with ONE
aggregate, groupBy(v).agg(mode(nl, deterministic=true)) — Spark 4's
deterministic mode is exactly the operator's contract (most frequent
value, ties broken by MIN), with a TypedImperativeAggregate buffer that
partial-aggregates map-side. Halves the per-round exchanges.

Protocol (CLAUDE.md): tie-hostile fixture equality first, then sorted
collect equality at sf0.1 + checksum equality at sf10-e100, then
same-session interleaved ABAB at both scales, BOTH alternation orders.

    python tools/opt_r18_abab_labelprop.py [sf10_edges_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _sym_edges,
    graph_labelprop_over,
)
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def labelprop_mode(pairs, iters: int = 3, broadcast_labels: bool = False):
    edges = _sym_edges(pairs.select("a_id", "b_id"))
    labels = edges.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").cast("bigint").alias("lbl")
    )
    for _ in range(iters):
        lbls = F.broadcast(labels) if broadcast_labels \
            else labels.hint("shuffle_hash")
        labels = (
            edges.alias("e")
            .join(lbls.alias("l"), F.col("e.u") == F.col("l.id"))
            .groupBy(F.col("e.v").alias("id"))
            .agg(F.mode(F.col("l.lbl"), True).cast("bigint").alias("lbl"))
        )
    return labels.select(F.col("id").alias("doc_id"), "lbl")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def checksum(df):
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("doc_id") * F.lit(31) + F.col("lbl") % 1000003).alias("s"),
    ).collect()[0]
    return (r["n"], r["s"])


def main() -> None:
    spark = get_spark("opt_r18_abab_labelprop")
    sc = spark.sparkContext

    # --- 1. tie-hostile fixture: equal counts must resolve to MIN label,
    # across partial-merge boundaries (8 partitions force merges)
    rows = []
    # node 1: labels 5 x3, 3 x3, 9 x2 -> tie 5 vs 3 -> 3
    rows += [(1, 5)] * 3 + [(1, 3)] * 3 + [(1, 9)] * 2
    # node 2: single neighbor label
    rows += [(2, 7)]
    # node 3: 3-way tie 10/20/30 -> 10
    rows += [(3, 10), (3, 20), (3, 30)]
    fix = spark.createDataFrame(rows, "v long, nl long").repartition(8)
    # replicate the production reduction on the fixture
    cnt = fix.groupBy("v", "nl").agg(F.count("*").alias("c"))
    ref = (
        cnt.groupBy("v")
        .agg(F.max(F.struct(F.col("c"), (-F.col("nl")).alias("neg"))).alias("s"))
        .select("v", (-F.col("s.neg")).cast("bigint").alias("lbl"))
    )
    got = fix.groupBy("v").agg(F.mode("nl", True).cast("bigint").alias("lbl"))
    a = sorted(map(tuple, ref.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b, f"tie fixture diverged: {a} vs {b}"
    print("tie fixture: mode(deterministic) == max-count-min-label OK", a)

    # --- 2. sf0.1 equality + ABAB through the registered pipeline shape
    from flink_cdc_multi_spark.plans.extensions import (
        _PAGERANK_BCAST_BYTES,
        _local_input_rows,
        _ngram_pair_candidates,
    )
    from flink_cdc_multi_spark.plans.queries import load_table

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 500)
    pairs = _ngram_pair_candidates(docs, mult=50).select("a_id", "b_id")
    bcast = _local_input_rows(SF_DIR, "documents") * 16 <= _PAGERANK_BCAST_BYTES
    cur = graph_labelprop_over(pairs, broadcast_labels=bcast)
    new = labelprop_mode(pairs, broadcast_labels=bcast)
    ca = sorted(map(tuple, cur.collect()))
    cb = sorted(map(tuple, new.collect()))
    assert ca == cb, "sf0.1 results diverged"
    print(f"sf0.1 equality OK ({len(ca)} rows)")

    for order in ("AB", "BA"):
        ts = {"cur": [], "mode": []}
        seq = [("cur", cur), ("mode", new)] if order == "AB" \
            else [("mode", new), ("cur", cur)]
        for name, df in seq:  # warmup
            sc.setJobDescription(f"warm {name}")
            noop(df)
        for i in range(4):
            for name, df in seq:
                sc.setJobDescription(f"{name} {order} r{i}")
                ts[name].append(noop(df))
        med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
        print(f"sf0.1 order {order}: cur med {med['cur']:.3f}s "
              f"mode med {med['mode']:.3f}s  "
              f"ratio {med['cur'] / med['mode']:.2f}x  {ts}")

    # --- 3. sf10 e100 edge graph (if present)
    edges_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r18_e100"
    if not os.path.exists(os.path.join(edges_dir, "_SUCCESS")):
        from flink_cdc_multi_spark.operators import dedup as D

        sf10 = "/tmp/sf10"
        if not os.path.isdir(sf10):
            print(f"no {sf10}; skipping sf10 leg")
            return
        docs10 = load_table(spark, sf10, "documents")
        p10 = D.minhash_lsh_pairs(docs10, threshold=0.5).select("a_id", "b_id")
        sc.setJobDescription("build e100 edges (untimed)")
        p10.write.mode("overwrite").parquet(edges_dir)
    pairs10 = spark.read.parquet(edges_dir)
    for bc in (True, False):
        cur10 = graph_labelprop_over(pairs10, broadcast_labels=bc)
        new10 = labelprop_mode(pairs10, broadcast_labels=bc)
        if bc:
            k1, k2 = checksum(cur10), checksum(new10)
            assert k1 == k2, f"sf10 checksum diverged: {k1} vs {k2}"
            print(f"sf10 checksum OK {k1}")
        for order in ("AB", "BA"):
            ts = {"cur": [], "mode": []}
            seq = [("cur", cur10), ("mode", new10)] if order == "AB" \
                else [("mode", new10), ("cur", cur10)]
            for name, df in seq:
                sc.setJobDescription(f"warm10 {name} bc={bc}")
                noop(df)
            for i in range(3):
                for name, df in seq:
                    sc.setJobDescription(f"sf10 {name} bc={bc} {order} r{i}")
                    ts[name].append(noop(df))
            med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
            print(f"sf10 bcast={bc} order {order}: cur med {med['cur']:.2f}s "
                  f"mode med {med['mode']:.2f}s  "
                  f"ratio {med['cur'] / med['mode']:.2f}x  {ts}")


if __name__ == "__main__":
    main()

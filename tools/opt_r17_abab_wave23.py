"""r17 wave 2/3 same-session ABAB probes (guide §1 + repo methodology):
one Spark session, alternated variants, median-of-N — never cross-JVM.

  wave 2 (MEASURED AND REJECTED): drop_duplicate_spans freq agg —
          A = shipped one-level min(struct) canon (SortAggregate), vs
          B = candidate two-level all-numeric HashAggregate + canon
          join, reconstructed inline below. The candidate removes the
          SortAggregate but references the exploded window stream three
          times (freq1 twice + the probe), and the recomputation of the
          Generate-heavy subtree costs more than the per-task sort it
          saves: sf0.1 A 1.78 s / 7 jobs vs B 3.35 s / 10 jobs; sf1
          A 3.36 s vs B 4.39 s (gap narrows with scale but never
          crosses). Checksums equal both SFs. The shipped form stays
          min(struct); OPTIMIZATION_r17.md wave 2 records the decision.
  wave 3 (SHIPPED): kcenter_greedy build — A = distributed 8-round
          mapInPandas path (forced local_max=0) vs B = shipped
          driver-local small-corpus fast path. Picks bit-equal.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.operators import similarity as S  # noqa: E402
from flink_cdc_multi_spark.operators.dedup import (  # noqa: E402
    _md5_hash60,
    _shingle_array,
    _token_barrier,
)
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _COMMONNESS_BCAST_BYTES,
    _local_input_bytes,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def candidate_drop_duplicate_spans(df: DataFrame, id_col="doc_id",
                                   text_col="text", n=5,
                                   freq_broadcast=False) -> DataFrame:
    """The REJECTED two-level candidate (see module docstring): canonical
    pick split into two all-numeric HashAggregates + a canon join.
    Equivalent (min(struct) is lexicographic, id dominates, (id, pos)
    unique per posexplode row) but rebuilds the exploded window stream
    three times."""
    tok = _token_barrier(df.filter(F.col(text_col).isNotNull()), id_col, text_col)
    w = (
        tok.select("id", F.size("toks").alias("n_toks"),
                   F.posexplode(_shingle_array(n)).alias("pos", "s"))
        .select("id", "n_toks", "pos", _md5_hash60(F.col("s")).alias("h"))
    )
    freq1 = w.groupBy("h", "id").agg(
        F.count("*").alias("cnt"), F.min("pos").alias("mpos")
    )
    freqA = freq1.groupBy("h").agg(
        F.sum("cnt").alias("tot"), F.min("id").alias("cid")
    )
    freq = (
        freqA.hint("shuffle_hash")
        .join(
            freq1.select(F.col("h").alias("h1"), F.col("id").alias("id1"),
                         "mpos"),
            (F.col("h") == F.col("h1")) & (F.col("cid") == F.col("id1")),
        )
        .select(
            "h", "tot",
            F.struct(F.col("cid"), F.col("mpos").alias("cpos")).alias("canon"),
        )
    )
    if freq_broadcast:
        freq = F.broadcast(freq)
    removed = (
        w.join(freq, "h")
        .filter((F.col("tot") >= 2)
                & ~((F.col("id") == F.col("canon.cid"))
                    & (F.col("pos") == F.col("canon.cpos"))))
        .select("id", F.explode(F.sequence(
            F.col("pos"),
            F.col("pos") + F.least(F.lit(n), F.col("n_toks")) - 1)).alias("rp"))
        .groupBy("id").agg(F.collect_set("rp").alias("removed"))
    )
    empty = F.array().cast("array<int>")
    keep = F.filter("toks", lambda t, i: ~F.array_contains(
        F.coalesce(F.col("removed"), empty), i))
    return (
        tok.join(removed.hint("shuffle_hash"), "id", "left")
        .select(F.col("id").alias(id_col),
                F.size("toks").cast("bigint").alias("n_tokens"),
                F.coalesce(F.size("removed"), F.lit(0)).cast("bigint").alias("n_removed"),
                F.array_join(keep, " ").alias("cleaned"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ABAB_ROUNDS", "4"))
    spark = get_spark("opt_r17_abab_w23",
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16m"})
    sc = spark.sparkContext

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bcast = _local_input_bytes(sf_dir, "documents") <= _COMMONNESS_BCAST_BYTES
    print(f"sf_dir={sf_dir} freq_broadcast={bcast}", flush=True)
    dfa = D.drop_duplicate_spans(docs, freq_broadcast=bcast)
    dfb = candidate_drop_duplicate_spans(docs, freq_broadcast=bcast)

    if os.environ.get("ABAB_EQ", "1") == "1":
        # result equality first (sorted collect) — cheap at sf0.1; at
        # sf10 compare integer checksums instead of collecting 500k rows
        agg = lambda df: df.agg(  # noqa: E731
            F.count("*"), F.sum("n_tokens"), F.sum("n_removed"),
            F.sum(F.crc32(F.col("cleaned")) % 1000003),
            F.sum(F.crc32(F.concat_ws("|", "doc_id", "cleaned")) % 1000003),
        ).collect()[0]
        ca, cb = agg(dfa), agg(dfb)
        print(f"spans_drop checksums equal: {tuple(ca) == tuple(cb)} {tuple(ca)}",
              flush=True)

    def run(df: DataFrame, tag: str) -> tuple[float, int]:
        g = f"{tag}-{time.monotonic_ns()}"
        sc.setJobGroup(g, tag)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(g))
        sc.setJobGroup("", "")
        return dt, jobs

    run(dfa, "warmA"); run(dfb, "warmB")
    ta, tb, ja, jb = [], [], None, None
    for _ in range(rounds):
        dt, ja = run(dfa, "A"); ta.append(dt)
        dt, jb = run(dfb, "B"); tb.append(dt)
        dt, jb = run(dfb, "B"); tb.append(dt)
        dt, ja = run(dfa, "A"); ta.append(dt)
    print(f"spans_drop SHIPPED   median {statistics.median(ta):.3f}s jobs {ja} {sorted(ta)}")
    print(f"spans_drop CANDIDATE median {statistics.median(tb):.3f}s jobs {jb} {sorted(tb)}")

    # ---- wave 3: kcenter build, distributed vs local ----
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    pa = S.kcenter_greedy(emb, k=8, dim=64, local_max=0)
    pb = S.kcenter_greedy(emb, k=8, dim=64)
    print(f"kcenter picks equal: {pa == pb} ({pb})", flush=True)
    ka, kb = [], []
    for _ in range(rounds):
        t0 = time.perf_counter(); S.kcenter_greedy(emb, k=8, dim=64, local_max=0)
        ka.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); S.kcenter_greedy(emb, k=8, dim=64)
        kb.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); S.kcenter_greedy(emb, k=8, dim=64)
        kb.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); S.kcenter_greedy(emb, k=8, dim=64, local_max=0)
        ka.append(time.perf_counter() - t0)
    print(f"kcenter DIST median {statistics.median(ka):.3f}s {sorted(ka)}")
    print(f"kcenter LOCAL median {statistics.median(kb):.3f}s {sorted(kb)}")


if __name__ == "__main__":
    main()

"""r17 ext_ann_lsh fusion probe — same methodology as opt_r17_abab_ivf.py
(one Spark session, alternated variants, median-of-N, equality before
timing; see that file's header for the rules).

Fusion (guide §4.1/§4.2/§4.4): the unfused lsh_topk plan pays the
corpus-side sig ArrowEvalPython TWICE (pushed isnotnull re-evaluation —
the exact trap ext_ann_ivf had), a query-side sig hop + 13-way probe
explode + BroadcastExchange, a join + pair-key dropDuplicates
SortAggregate pair, and an INTERPRETED zip_with/aggregate cosine fold
per candidate. The fused form collects the query set at plan time,
computes buckets + probe sets driver-side with the same exact-int64
kernel, and runs sig + membership-mask + cosine in ONE mapInPandas pass
(membership is inherently deduplicated — the dropDuplicates exchange
disappears).

  A = unfused (lsh_topk(..., fused=False) — the pre-r17 plan)
  B = fused   (the shipped default)
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import similarity as S  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir: str, fused: bool):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    corpus = emb.filter(F.col("vec_id") >= 20)
    return S.lsh_topk(corpus, queries, dim=64, k=3, n_planes=10,
                      fused=fused)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ABAB_ROUNDS", "4"))
    spark = get_spark("opt_r17_abab_lsh",
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16m"})
    sc = spark.sparkContext

    adv = tempfile.mkdtemp(prefix="adv_lsh_")
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "gen_adversarial_sf.py"),
         "/root/testdata/sf0.001", adv],
        check=True, capture_output=True,
    )
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", sf_dir, adv):
        ra = sorted(map(tuple, build(spark, d, fused=False).collect()))
        rb = sorted(map(tuple, build(spark, d, fused=True).collect()))
        print(f"{d}: equal={ra == rb} rows={len(rb)}", flush=True)
        assert ra == rb, f"lsh fused mismatch at {d}"

    def run(fused: bool, tag: str) -> tuple[float, int]:
        g = f"{tag}-{time.monotonic_ns()}"
        sc.setJobGroup(g, tag)
        t0 = time.perf_counter()
        df = build(spark, sf_dir, fused=fused)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(g))
        sc.setJobGroup("", "")
        return dt, jobs

    run(False, "warmA"); run(True, "warmB")
    ta, tb, ja, jb = [], [], None, None
    for _ in range(rounds):
        dt, ja = run(False, "A"); ta.append(dt)
        dt, jb = run(True, "B"); tb.append(dt)
        dt, jb = run(True, "B"); tb.append(dt)
        dt, ja = run(False, "A"); ta.append(dt)
    print(f"ext_ann_lsh UNFUSED median {statistics.median(ta):.3f}s "
          f"jobs {ja} {sorted(round(t, 3) for t in ta)}")
    print(f"ext_ann_lsh FUSED   median {statistics.median(tb):.3f}s "
          f"jobs {jb} {sorted(round(t, 3) for t in tb)}")


if __name__ == "__main__":
    main()

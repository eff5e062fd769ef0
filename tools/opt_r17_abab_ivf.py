"""r17 ext_ann_ivf fusion probe (guide §1 + repo methodology): one Spark
session, alternated variants, median-of-N — never cross-JVM.

Fusion (guide §4.1/§4.2/§4.4): ivf_topk_fixed's unfused plan pays
  - TWO corpus-side cell_of ArrowEvalPython evaluations (the optimizer
    pushes the join's isnotnull(cell) below the UDF and re-evaluates it —
    guide §4.4's duplication trap, plans/r17/ext_ann_ivf_before.txt
    nodes (3)/(7)),
  - a query-side probes_of ArrowEvalPython + explode + BroadcastExchange,
  - and an INTERPRETED zip_with/aggregate cosine fold per candidate pair
    (|corpus|·n_probe/n_clusters pairs per query — the scale cost).
The fused form collects the control-plane-sized query set at plan time
(the brute_force_topk shape) and runs cells + candidate masks + scoring
in ONE mapInPandas pass with bit-identical left-to-right fold arithmetic.

  A = unfused (ivf_topk_fixed(..., fused=False) — the pre-r17 plan)
  B = fused   (the shipped default)

Result equality is asserted on full sorted collects at sf0.001 / sf0.01 /
the bench SF AND on an adversarial fixture (zero-norm / NULL / ragged /
over-length query rows) before any timing is trusted. Each timed run
includes plan construction (the fused path moves work to plan time — the
collects must be inside the timed region, same rule as the kcenter probe).
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
    centroids = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 36))
    return S.ivf_topk_fixed(corpus, queries, centroids, k=3, n_probe=4,
                            fused=fused)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("ABAB_ROUNDS", "4"))
    spark = get_spark("opt_r17_abab_ivf",
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16m"})
    sc = spark.sparkContext

    # -- equality first, at every SF + the adversarial fixture ------------
    adv = tempfile.mkdtemp(prefix="adv_ivf_")
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
        assert ra == rb, f"ivf fused mismatch at {d}"

    # -- ABAB timing (plan build INSIDE the timed region) ------------------
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
    print(f"ext_ann_ivf UNFUSED median {statistics.median(ta):.3f}s "
          f"jobs {ja} {sorted(round(t, 3) for t in ta)}")
    print(f"ext_ann_ivf FUSED   median {statistics.median(tb):.3f}s "
          f"jobs {jb} {sorted(round(t, 3) for t in tb)}")


if __name__ == "__main__":
    main()

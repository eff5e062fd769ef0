"""r18 optimization-round measurement harness (guide §1).

For every registered query (or a named subset): prepare the plan once,
warm it, then time min-of-N noop-sink executions; record the per-run JOB
COUNT (the sf0.1 cost driver — CLAUDE.md: per-job floor ~0.15-0.2 s) via
a per-query job group, and dump ``explain("formatted")`` to
``plans/r18/<query>_<tag>.txt`` so plan claims are checkable offline.

Usage:
  python tools/opt_r18_measure.py [--tag before] [--runs 3] [--no-explain] [q ...]

Writes a JSON summary to plans/r18/measure_<tag>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_multi_spark.plans import ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    runs = 3
    do_explain = True
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--runs":
            runs = int(next(it))
        elif a == "--no-explain":
            do_explain = False
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "opt_r18_measure", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    sc = spark.sparkContext
    plan_dir = os.path.join(REPO, "plans", "r18")
    os.makedirs(plan_dir, exist_ok=True)

    targets = names or sorted(ALL_QUERIES)
    out: dict = {"tag": tag, "sf_dir": sf_dir, "runs": runs, "queries": {}}
    for q in targets:
        try:
            t_plan0 = time.perf_counter()
            df = ALL_QUERIES[q](spark, sf_dir)
            plan_sec = round(time.perf_counter() - t_plan0, 4)
        except Exception as e:  # noqa: BLE001
            out["queries"][q] = {"error": f"plan: {type(e).__name__}: {e}"[:300]}
            continue
        if do_explain:
            try:
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(plan_dir, f"{q}_{tag}.txt"), "w") as f:
                    f.write(txt)
            except Exception as e:  # noqa: BLE001
                out["queries"][q] = {"error": f"explain: {e}"[:300]}
                continue

        def run() -> None:
            df.write.format("noop").mode("overwrite").save()

        try:
            sc.setJobDescription(f"{q} warmup")
            run()  # warm: codegen compile, broadcast build
            samples = []
            job_counts = []
            for i in range(runs):
                group = f"{q}-r{i}"
                sc.setJobGroup(group, q)
                t0 = time.perf_counter()
                run()
                samples.append(round(time.perf_counter() - t0, 4))
                job_counts.append(
                    len(sc.statusTracker().getJobIdsForGroup(group))
                )
                sc.setJobGroup("", "")
            out["queries"][q] = {
                "min_sec": min(samples),
                "samples": samples,
                "jobs": job_counts[-1],
                "plan_build_sec": plan_sec,
            }
            print(
                f"{q:34s} min {min(samples):7.3f}s jobs {job_counts[-1]:3d} "
                f"(plan {plan_sec:.2f}s) {samples}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            out["queries"][q] = {"error": f"exec: {type(e).__name__}: {e}"[:300]}
            print(f"{q:34s} ERROR {out['queries'][q]['error']}", flush=True)

    # committed with the round (VERDICT r17 item 7: the r17 baseline
    # JSON lived in /tmp and did not survive the round)
    path = os.path.join(REPO, "plans", "r18", f"measure_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

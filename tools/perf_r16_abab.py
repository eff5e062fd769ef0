"""r16 ABAB adjudication (VERDICT r15 item 6): same-session alternation of
the sub-second sf0.1 swings the r14→r15 bench table showed —

  ext_graph_pagerank 1.55→2.50 s (the only one whose CODE changed: the
  gated default flipped to the footer-guarded broadcast_ranks form), and
  ext_ann_ivf 1.22→1.94 / ext_ann_ivfpq_res 0.66→1.21 (code untouched —
  claimed ambient by the r15 wave spread).

Method per the repo rule (CLAUDE.md): separate-JVM A/B carries a
systematic second-runner penalty, so any <30% delta must be interleaved
in ONE session, both alternation orders. Here:

- pagerank: A = broadcast_ranks form, B = shuffle_hash form, built over
  the IDENTICAL edge frame; ABAB + BABA waves, per-variant median.
- ann_ivf / ann_ivfpq_res: the code didn't change, so the question is
  only run-to-run spread — N repeated noop executions of the registry
  plan after one warmup (plan-time index builds are memoized in
  extensions._session_cache, so rep timings measure the serve path).

Prints one JSON line; PERF.md records the verdict.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_cdc_multi_spark.session import get_spark  # noqa: E402
from flink_cdc_multi_spark.plans import ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _ngram_pair_candidates,
    graph_pagerank_over,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def run_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    spark = get_spark("perf-r16-abab")
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 500)
    edges = _ngram_pair_candidates(docs, mult=50).select("a_id", "b_id")
    variants = {
        "bcast": graph_pagerank_over(edges, broadcast_ranks=True),
        "shuffle": graph_pagerank_over(edges, broadcast_ranks=False),
    }
    # warmup both (codegen compile, shuffle file spin-up)
    for df in variants.values():
        run_noop(df)
    times: dict[str, list[float]] = {k: [] for k in variants}
    for order in (("bcast", "shuffle"), ("shuffle", "bcast")) * 3:
        for name in order:
            times[name].append(run_noop(variants[name]))

    ann: dict[str, list[float]] = {}
    for qname in ("ext_ann_ivf", "ext_ann_ivfpq_res"):
        df = ALL_QUERIES[qname](spark, SF_DIR)
        run_noop(df)  # warmup (+ memoized plan-time build on first touch)
        ann[qname] = [run_noop(df) for _ in range(5)]

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "sf_dir": SF_DIR,
        "pagerank": {k: {"median": med(v), "samples": v}
                     for k, v in times.items()},
        "ann_spread": {k: {"median": med(v), "min": min(v), "max": max(v),
                           "samples": v} for k, v in ann.items()},
    }))


if __name__ == "__main__":
    main()

"""Interleaved A/B: ext_text_commonness shuffle join vs broadcast(freq)
(VERDICT r10 item 6).

One Spark session, alternated variants, min-of-N wall each — the same
controlled methodology as sweep_sf10_ext.py. Results are asserted
identical (sorted collect compare on the aggregate output, which is
small: one row per doc) before any timing is trusted.

    python tools/ab_commonness_broadcast.py /tmp/sf10 [n_runs]

The broadcast variant is forced by raising the module threshold; the
shuffle variant by zeroing it — same code path the shipped guard takes
on small local inputs / large-or-remote inputs respectively.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from flink_cdc_multi_spark.plans import extensions as E  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def _run(spark, sf_dir, threshold):
    E._COMMONNESS_BCAST_BYTES = threshold
    df = E.ext_text_commonness(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, df


def main(sf_dir: str, runs: int = 3) -> None:
    spark = get_spark()
    saved = E._COMMONNESS_BCAST_BYTES
    try:
        # result equivalence first (small output: 1 row/doc of 3 ints)
        _, d_shuf = _run(spark, sf_dir, 0)
        _, d_bcast = _run(spark, sf_dir, 1 << 62)
        a = sorted(map(tuple, d_shuf.collect()))
        b = sorted(map(tuple, d_bcast.collect()))
        assert a == b, f"variant results diverge: {len(a)} vs {len(b)} rows"
        print(f"results identical: {len(a)} rows", flush=True)

        times = {"shuffle": [], "broadcast": []}
        for i in range(runs):
            for name, thr in (("shuffle", 0), ("broadcast", 1 << 62)):
                dt, _ = _run(spark, sf_dir, thr)
                times[name].append(round(dt, 3))
                print(f"run {i} {name}: {dt:.3f}s", flush=True)
        for name, ts in times.items():
            print(f"{name}: min {min(ts):.3f}s  all {ts}")
    finally:
        E._COMMONNESS_BCAST_BYTES = saved
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)

"""r17 wave 8 same-session ABAB probe (guide §1 + repo methodology):
one Spark session, alternated variants, median-of-N — never cross-JVM.

Wave 8 hypothesis (guide §2.1 remove shuffles / §2.2 shuffle fewer
bytes, plus the wave-5/6 lesson that a duplicated subtree is a full
corpus re-pass): both span queries derive the tokenize+shingle+hash
window stream TWICE — once feeding the freq aggregate, once as the join
probe (plans/r17/ext_dedup_spans*_before this round: split ×2-3,
zip_with shingle + xxhash64 ×2).

  spans (signal)  A = commonness join form (freq broadcast-when-small,
                      probe re-derived)
                  B = unique-complement: n_dup = n_windows − #(tot==1
                      windows owned by the doc); min(doc_id) pins the
                      owner of a unique window, n_windows comes from a
                      split-free regexp_count scan — NO h join at all.
  spans_drop      A = commonness topology (freq broadcast, probe
                      re-derived)                       [onepass=False]
                  B = single derivation: w.repartition(h) feeds BOTH
                      the freq agg (rides the partitioning) and the
                      probe (runtime ReusedExchange), SHJ on h.
                                                        [onepass=True]

Unlike wave 2's rejected candidate, neither B re-derives the stream it
restructures — B derives it STRICTLY FEWER times than A.

Full sorted-collect equality A==B is asserted at every SF (and on the
adversarial fixture via --adversarial) before any timing is trusted.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.operators.dedup import (  # noqa: E402
    _shingle_array,
    _token_barrier,
)
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _COMMONNESS_BCAST_BYTES,
    _local_input_bytes,
)
from flink_cdc_multi_spark.plans import extensions as E  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def q_spans_old(spark, sf_dir: str) -> DataFrame:
    """The pre-wave-8 ext_dedup_spans (commonness join on h)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = _token_barrier(docs, "doc_id", "text")
    w = (
        tok.select(F.col("id").alias("doc_id"),
                   F.explode(_shingle_array(5)).alias("s"))
        .select("doc_id", F.xxhash64(F.col("s")).alias("h"))
    )
    freq = w.groupBy("h").agg(F.count("*").alias("tot"))
    if _local_input_bytes(sf_dir, "documents") <= _COMMONNESS_BCAST_BYTES:
        freq = F.broadcast(freq)
    return (
        w.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_windows"),
            F.sum(F.when(F.col("tot") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_dup_windows"),
        )
        .select("doc_id", "n_windows", "n_dup_windows")
    )


def q_spans_new(spark, sf_dir: str) -> DataFrame:
    return E.ext_dedup_spans(spark, sf_dir)


def q_drop(spark, sf_dir: str, onepass: bool) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return D.drop_duplicate_spans(
        docs, id_col="doc_id", text_col="text", n=5,
        freq_broadcast=(
            _local_input_bytes(sf_dir, "documents") <= _COMMONNESS_BCAST_BYTES
        ),
        onepass=onepass,
    )


VARIANTS = {
    "spans": (lambda s, d: q_spans_old(s, d), lambda s, d: q_spans_new(s, d)),
    "spans_drop": (lambda s, d: q_drop(s, d, False), lambda s, d: q_drop(s, d, True)),
}


def run_noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sfs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.1"]
    rounds = int(os.environ.get("SPANS_ROUNDS", "4"))
    only = os.environ.get("SPANS_ONLY")
    variants = (
        {k: v for k, v in VARIANTS.items() if k in set(only.split(","))}
        if only else VARIANTS
    )
    spark = get_spark("opt-r17-abab-spans")
    if "--adversarial" in sys.argv:
        import subprocess
        adv = "/tmp/adv_spans_sf"
        if not os.path.exists(os.path.join(adv, "documents.parquet")):
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "gen_adversarial_sf.py"),
                 "/root/testdata/sf0.001", adv],
                check=True)
        sfs = [adv] + sfs
    for sf_dir in sfs:
        print(f"== {sf_dir} ==", flush=True)
        for name, (fa, fb) in variants.items():
            a, b = fa(spark, sf_dir), fb(spark, sf_dir)
            ra = sorted(map(tuple, a.collect()))
            rb = sorted(map(tuple, b.collect()))
            assert ra == rb, (
                f"{name}: A/B value mismatch at {sf_dir} "
                f"({len(ra)} vs {len(rb)} rows)")
            print(f"{name}: A==B on {len(ra)} rows", flush=True)
            ta, tb = [], []
            for r in range(rounds):
                order = ("A", "B") if r % 2 == 0 else ("B", "A")
                for lane in order:
                    fn = fa if lane == "A" else fb
                    spark.sparkContext.setJobDescription(f"{name}:{lane}:r{r}")
                    sec = run_noop(fn(spark, sf_dir))
                    (ta if lane == "A" else tb).append(sec)
            spark.sparkContext.setJobDescription(None)
            ma, mb = statistics.median(ta), statistics.median(tb)
            print(
                f"{name:11s} old {ma:7.3f}s  new {mb:7.3f}s  "
                f"ratio {ma / mb if mb else float('inf'):5.2f}x  "
                f"(old {['%.2f' % x for x in ta]} new {['%.2f' % x for x in tb]})",
                flush=True,
            )


if __name__ == "__main__":
    main()

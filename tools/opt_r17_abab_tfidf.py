"""r17 wave 9 same-session ABAB probe (guide §1 + repo methodology):
one Spark session, alternated variants, median-of-N — never cross-JVM.

Wave 9 hypothesis (the wave-8 subtree-identity lesson applied to
ext_text_tfidf): `dfq = tf.groupBy(h).count()` plans a DISTINCT
aggregate (Functions: []) because nothing reads tf's count buffer, so
the df branch's (doc_id, token) exchange subtree differs from the tf
branch's and Catalyst derives the whole tokenize+explode+distinct pass
TWICE (plan-audited: two split Generates). Forcing the df aggregate to
READ tf — sum(when(tf >= 1, 1)), which Catalyst cannot fold to count(1)
— aligns the subtrees and the exchange is built once (runtime
ReusedExchange, verified on the executed plan).

  A = count("*") df aggregate (two tokenize passes)   [old]
  B = guarded-sum df aggregate (one pass + reuse)     [shipped]

Values: tf >= 1 on every row, so the guarded sum IS the row count —
asserted equal on full sorted collects before any timing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from flink_cdc_multi_spark.operators.text import widen_narrow_scan  # noqa: E402
from flink_cdc_multi_spark.plans import extensions as E  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _COMMONNESS_BCAST_BYTES,
    _TFIDF_TOP_K,
    _local_input_bytes,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def q_tfidf_old(spark, sf_dir: str) -> DataFrame:
    """The pre-wave-9 ext_text_tfidf (count(*) df aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.xxhash64("token")
    tok = widen_narrow_scan(docs.filter(F.trim(F.col("text")) != "")).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).withColumn("h", h)
    dfq = tf.groupBy("h").agg(F.count("*").alias("df"))
    if _local_input_bytes(sf_dir, "documents") <= _COMMONNESS_BCAST_BYTES:
        dfq = F.broadcast(dfq)
    win = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df").cast("double")).desc(),
        F.col("token").asc(),
    )
    return (
        tf.join(dfq, "h")
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= _TFIDF_TOP_K)
        .select(
            "doc_id",
            F.col("rnk").cast("bigint").alias("rnk"),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
        )
    )


def q_commonness_old(spark, sf_dir: str) -> DataFrame:
    """The pre-wave-9 ext_text_commonness (two token-stream passes)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.xxhash64("token")
    tok = (
        widen_narrow_scan(docs.filter(F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
        )
        .select("doc_id", h.alias("h"))
    )
    freq = tok.groupBy("h").agg(F.count("*").alias("tf"))
    if _local_input_bytes(sf_dir, "documents") <= _COMMONNESS_BCAST_BYTES:
        freq = F.broadcast(freq)
    return (
        tok.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("tf_sum"),
            F.count("*").cast("bigint").alias("n_tokens"),
        )
        .select("doc_id", "tf_sum", "n_tokens")
    )


def run_noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sfs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.1"]
    rounds = int(os.environ.get("TFIDF_ROUNDS", "4"))
    spark = get_spark("opt-r17-abab-tfidf")
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
    only = os.environ.get("TFIDF_ONLY")
    variants = {
        "tfidf": (q_tfidf_old, E.ext_text_tfidf),
        "commonness": (q_commonness_old, E.ext_text_commonness),
    }
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in set(only.split(","))}
    for sf_dir in sfs:
        print(f"== {sf_dir} ==", flush=True)
        for name, (qa, qb) in variants.items():
            fa = lambda: qa(spark, sf_dir)  # noqa: E731
            fb = lambda: qb(spark, sf_dir)  # noqa: E731
            ra = sorted(map(tuple, fa().collect()))
            rb = sorted(map(tuple, fb().collect()))
            assert ra == rb, (
                f"{name} A/B mismatch at {sf_dir} ({len(ra)}/{len(rb)})")
            print(f"{name}: A==B on {len(ra)} rows", flush=True)
            ta, tb = [], []
            for r in range(rounds):
                order = ("A", "B") if r % 2 == 0 else ("B", "A")
                for lane in order:
                    fn = fa if lane == "A" else fb
                    spark.sparkContext.setJobDescription(f"{name}:{lane}:r{r}")
                    sec = run_noop(fn())
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

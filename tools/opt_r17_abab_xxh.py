"""r17 wave 7 same-session ABAB probe (guide §1 + repo methodology):
one Spark session, alternated variants, median-of-N — never cross-JVM.

Wave 7 hypothesis (guide §1.2 step 2 per-task work; the sketch-gate
xxhash64 lane shipped in the r17 build phase, VERDICT r16 item 4 noted
"the same cost rides every md5-hash60 gate query"): the remaining
md5-hash60 contract queries pay `md5 + substring + conv(hex,16,10)` per
hashed value (token occurrence / 5-token window / line / shingle) where
ONE whole-stage-codegen `F.xxhash64` call would do — now oracle-gateable
via functions/xxh64_sql.xxh64_cte. contamination additionally pays the
hash INTERPRETED per element (in-lambda, no codegen). line_dedup's key
narrows 32-char string → 8-byte bigint (guide §2.3 shuffle fewer bytes).

  A = md5-hash60 contract (shipped form at probe time)
  B = xxhash64 lane candidate

Hash-independent outputs (everything except quality_score's score,
which changes bucket assignment BY DESIGN) are asserted equal on full
sorted collects before any timing is trusted — a mismatch would mean a
60-bit/64-bit collision fold difference on this fixture (none expected).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.operators import text as X  # noqa: E402
from flink_cdc_multi_spark.operators.dedup import (  # noqa: E402
    _md5_hash60,
    _shingle_array,
    _token_barrier,
)
from flink_cdc_multi_spark.operators.text import widen_narrow_scan  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _COMMONNESS_BCAST_BYTES,
    _TFIDF_TOP_K,
    _local_input_bytes,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def h_of(lane):
    if lane == "md5":
        return _md5_hash60
    return F.xxhash64


def q_commonness(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = h_of(lane)(F.col("token"))
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


def q_tfidf(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = h_of(lane)(F.col("token"))
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


def q_spans(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = _token_barrier(docs, "doc_id", "text")
    w = (
        tok.select(F.col("id").alias("doc_id"),
                   F.explode(_shingle_array(5)).alias("s"))
        .select("doc_id", h_of(lane)(F.col("s")).alias("h"))
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


def q_spans_drop(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return D.drop_duplicate_spans(
        docs, id_col="doc_id", text_col="text", n=5,
        freq_broadcast=(
            _local_input_bytes(sf_dir, "documents") <= _COMMONNESS_BCAST_BYTES
        ),
        window_key=h_of(lane),
    )


def q_lines(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.line_dedup(
        docs, line_key=(F.md5 if lane == "md5" else (lambda c: F.xxhash64(c)))
    )


def q_quality(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    if lane == "md5":
        return X.quality_score(
            docs, bucket_of=lambda c: _md5_hash60(c) % 64
        )
    return X.quality_score(
        docs,
        bucket_of=lambda c: F.xxhash64(c).bitwiseAND(F.lit(63)),
    )


def q_contamination(spark, sf_dir: str, lane: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    key = _md5_hash60 if lane == "md5" else (lambda c: F.xxhash64(c))
    return D.contamination_report(
        corpus, probes, "doc_id", "text", n=3, shingle_key=key
    ).select(
        "doc_id",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        F.col("n_sh").cast("bigint").alias("n_sh"),
    )


QUERIES = {
    "commonness": (q_commonness, "equal"),
    "tfidf": (q_tfidf, "equal"),
    "spans": (q_spans, "equal"),
    "spans_drop": (q_spans_drop, "equal"),
    "lines": (q_lines, "equal"),
    "quality": (q_quality, "invariant"),  # score changes by design
    "contamination": (q_contamination, "equal"),
}


def run_noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/testdata/sf1"]
    rounds = int(os.environ.get("XXH_ROUNDS", "4"))
    only = os.environ.get("XXH_ONLY")
    queries = (
        {k: v for k, v in QUERIES.items() if k in set(only.split(","))}
        if only
        else QUERIES
    )
    spark = get_spark("opt-r17-abab-xxh")
    for sf_dir in sfs:
        print(f"== {sf_dir} ==", flush=True)
        for name, (fn, check) in queries.items():
            a = fn(spark, sf_dir, "md5")
            b = fn(spark, sf_dir, "xxh")
            if check == "equal":
                ra = sorted(map(tuple, a.collect()))
                rb = sorted(map(tuple, b.collect()))
                assert ra == rb, f"{name}: value mismatch md5 vs xxh at {sf_dir}"
            else:
                ra = sorted((r["doc_id"], r["n_tokens"]) for r in a.collect())
                rb = sorted((r["doc_id"], r["n_tokens"]) for r in b.collect())
                assert ra == rb, f"{name}: invariant mismatch at {sf_dir}"
            ta, tb = [], []
            for r in range(rounds):
                order = ("md5", "xxh") if r % 2 == 0 else ("xxh", "md5")
                for lane in order:
                    spark.sparkContext.setJobDescription(f"{name}:{lane}:r{r}")
                    sec = run_noop(fn(spark, sf_dir, lane))
                    (ta if lane == "md5" else tb).append(sec)
            spark.sparkContext.setJobDescription(None)
            ma, mb = statistics.median(ta), statistics.median(tb)
            print(
                f"{name:14s} md5 {ma:7.3f}s  xxh {mb:7.3f}s  "
                f"ratio {ma / mb if mb else float('inf'):5.2f}x  "
                f"(md5 {['%.2f' % x for x in ta]} xxh {['%.2f' % x for x in tb]})",
                flush=True,
            )


if __name__ == "__main__":
    main()

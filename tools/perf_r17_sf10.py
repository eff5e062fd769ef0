"""r17 sf10 scale measurements: the xxhash64 portable-hash fast lane
(VERDICT r16 item 4) and the CMS scale row it was still owed (item 2).

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf10 100
    python tools/perf_r17_sf10.py /tmp/sf10 [target ...]

Targets:

- hll_gap: SAME-SESSION interleaved A/B (ABAB, one Spark) of the two
  hash contracts for the HLL sketch — md5-hash60 (the r16 gated form)
  vs xxhash64 (the r17 gated form) — over the sf10 documents tokens.
  This is the verdict's "closes >= half the gap" evidence: the r16 gap
  was Spark-md5 3.0 s vs DuckDB-md5 1.3 s (2.3x).
- hll_500k / hll_merge_500k / kmv_500k / cms_500k: full cross-engine
  ABAB of the r17 gated queries against their oracles (now the
  generated XXH64 chain — ALGORITHM-EQUAL by construction: both
  engines run the identical hash + integer pipeline), integer
  checksums matched. Note the DuckDB side pays the SQL-rendered XXH64
  chain (~2 s per 5M hashed values, tests/test_xxh64_sql.py-pinned
  arithmetic); the md5-form DuckDB twin (the r16 record) remains the
  hash-neutral reference point for ambient comparisons.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL, ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def ab(name: str, plan, con, sql: str, spark_checksum, duck_checksum,
       runs: int = 2) -> dict:
    rec: dict = {}
    t0 = time.perf_counter()
    plan.write.format("noop").mode("overwrite").save()
    rec["spark_cold_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    rec["duck_cold_s"] = round(time.perf_counter() - t0, 3)
    sp, dk = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        plan.write.format("noop").mode("overwrite").save()
        sp.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dk.append(round(time.perf_counter() - t0, 3))
    rec.update({
        "spark_times": sp, "duck_times": dk,
        "spark_min": min(sp), "duck_min": min(dk),
        "ratio": round(min(sp) / min(dk), 3),
    })
    s_chk = spark_checksum(plan)
    d_chk = tuple(con.execute(
        f"SELECT COUNT(*), {duck_checksum} FROM ({sql})").fetchone())
    rec["spark_check"] = list(map(int, s_chk))
    rec["duck_check"] = list(map(int, d_chk))
    rec["check_match"] = list(s_chk) == list(d_chk)
    print(json.dumps({name: rec}), flush=True)
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    only = set(sys.argv[2:])

    def want(n: str) -> bool:
        return not only or n in only

    spark = get_spark(
        "perf-r17", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    con = duckdb.connect()
    for t in ("documents", "lineitem", "orders", "customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_docs = load_table(spark, sf_dir, "documents").count()
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n_docs}), flush=True)

    if want("hll_gap"):
        # Spark-only interleaved ABAB: md5 contract vs xxhash64 contract
        # on IDENTICAL input (one session, alternated — the r11 lesson:
        # separate-JVM A/B carries a systematic second-runner penalty)
        from flink_cdc_multi_spark.operators.text import tokens
        from flink_cdc_multi_spark.plans.extensions import hll_sketch_over

        docs = load_table(spark, sf_dir, "documents")
        toks = docs.filter(F.trim("text") != "").select(
            "lang",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"),
        )
        md5_plan = hll_sketch_over(toks, ["lang"], "token", use_xxhash=False)
        xx_plan = hll_sketch_over(toks, ["lang"], "token", use_xxhash=True)
        md5_t, xx_t = [], []
        for plan, times in [(md5_plan, md5_t), (xx_plan, xx_t)] * 3:
            t0 = time.perf_counter()
            plan.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"hll_gap": {
            "md5_times": md5_t, "xx_times": xx_t,
            "md5_min": min(md5_t[1:]), "xx_min": min(xx_t[1:]),
            "speedup": round(min(md5_t[1:]) / min(xx_t[1:]), 3),
        }}), flush=True)

    checks = {
        "hll_500k": (
            "ext_sketch_hll",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("harmonic_scaled"), F.sum("est_distinct")
            ).collect()[0]),
            "CAST(SUM(harmonic_scaled) AS BIGINT), "
            "CAST(SUM(est_distinct) AS BIGINT)",
        ),
        "hll_merge_500k": (
            "ext_sketch_hll_merge",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("harmonic_scaled"), F.sum("n_shards")
            ).collect()[0]),
            "CAST(SUM(harmonic_scaled) AS BIGINT), "
            "CAST(SUM(n_shards) AS BIGINT)",
        ),
        "kmv_500k": (
            "ext_sketch_kmv",
            # kth_min are signed 64-bit hash values near +-2^63 — a plain
            # SUM overflows long under ANSI; reduce mod a prime first
            # (Spark and DuckDB share dividend-sign % semantics)
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("k_eff"),
                F.sum(F.col("kth_min") % 1000003)
            ).collect()[0]),
            "CAST(SUM(k_eff) AS BIGINT), "
            "CAST(SUM(kth_min % 1000003) AS BIGINT)",
        ),
        "cms_500k": (
            "ext_sketch_cms",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("est_count"), F.sum(F.length("token"))
            ).collect()[0]),
            "CAST(SUM(est_count) AS BIGINT), "
            "CAST(SUM(length(token)) AS BIGINT)",
        ),
        "topk_500k": (
            "ext_topk_freq",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("est_lb"), F.sum("rnk")
            ).collect()[0]),
            "CAST(SUM(est_lb) AS BIGINT), CAST(SUM(rnk) AS BIGINT)",
        ),
        "bloom_500k": (
            "ext_sketch_bloom",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("n_bits_set"), F.sum("n_probe_hits")
            ).collect()[0]),
            "CAST(SUM(n_bits_set) AS BIGINT), "
            "CAST(SUM(n_probe_hits) AS BIGINT)",
        ),
        "qe_6M": (
            "ext_quality_expectations",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("n_checked"), F.sum("n_violations")
            ).collect()[0]),
            "CAST(SUM(n_checked) AS BIGINT), "
            "CAST(SUM(n_violations) AS BIGINT)",
        ),
        "motif_10M": (
            "ext_events_motif",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("n_users"), F.sum("n_hits")
            ).collect()[0]),
            "CAST(SUM(n_users) AS BIGINT), CAST(SUM(n_hits) AS BIGINT)",
        ),
        "outliers_10M": (
            "ext_events_outliers",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("n"), F.sum("n_outliers")
            ).collect()[0]),
            "CAST(SUM(n) AS BIGINT), CAST(SUM(n_outliers) AS BIGINT)",
        ),
        "scripts_500k": (
            "ext_text_scripts",
            lambda p: tuple(p.agg(
                F.count("*"), F.sum("n_docs"), F.sum("n_mixed")
            ).collect()[0]),
            "CAST(SUM(n_docs) AS BIGINT), CAST(SUM(n_mixed) AS BIGINT)",
        ),
    }
    for name, (qname, s_chk, d_chk) in checks.items():
        if want(name):
            ab(name, ALL_QUERIES[qname](spark, sf_dir), con,
               ALL_ORACLE_SQL[qname], s_chk, d_chk)


if __name__ == "__main__":
    main()

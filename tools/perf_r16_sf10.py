"""r16 sf10 scale measurements for the operators gated this round,
same-session interleaved ABAB Spark/DuckDB with integer checksums (the
perf_r15_sf10 methodology).

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf10 100
    python tools/perf_r16_sf10.py /tmp/sf10 [target ...]

Targets:

- hll_500k: ext_sketch_hll over the sf10 documents table (500k docs →
  per-lang 64-register sketches). The claim under test is the
  mergeable-sketch plan: partial_max collapses each map task to
  ≤ |langs|·64 rows before the one exchange, so throughput is the
  token-scan wall. Checksums: Σ harmonic_scaled + Σ est_distinct.
- split_500k: ext_split_by_content over sf10 documents — one md5 per
  row plus two stacked partial aggs on the 16-byte digest. Checksums:
  Σ n_texts + Σ n_docs.
- kcenter_full: kcenter_greedy UNSCOPED over the whole sf10 embeddings
  table (k=8) vs the generated DuckDB oracle with scope=TRUE — the k
  sequential rounds are the algorithm, so the number is the full
  selection wall (vectors/s·round), not a per-query noop.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import similarity as S  # noqa: E402
from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL, ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    _kcenter_oracle_sql,
)
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
        "perf-r16", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_docs = load_table(spark, sf_dir, "documents").count()
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n_docs}), flush=True)

    if want("hll_500k"):
        ab(
            "hll_500k",
            ALL_QUERIES["ext_sketch_hll"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_sketch_hll"],
            lambda p: tuple(
                p.agg(
                    F.count("*"),
                    F.sum("harmonic_scaled"),
                    F.sum("est_distinct"),
                ).collect()[0]
            ),
            "CAST(SUM(harmonic_scaled) AS BIGINT), "
            "CAST(SUM(est_distinct) AS BIGINT)",
        )

    if want("split_500k"):
        ab(
            "split_500k",
            ALL_QUERIES["ext_split_by_content"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_split_by_content"],
            lambda p: tuple(
                p.agg(
                    F.count("*"), F.sum("n_texts"), F.sum("n_docs")
                ).collect()[0]
            ),
            "CAST(SUM(n_texts) AS BIGINT), CAST(SUM(n_docs) AS BIGINT)",
        )

    if want("kcenter_full"):
        emb = load_table(spark, sf_dir, "embeddings")
        n_vec = emb.count()
        t0 = time.perf_counter()
        picks = S.kcenter_greedy(emb, k=8, dim=64)
        sp_wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        duck = con.execute(_kcenter_oracle_sql(k=8, scope="TRUE")).fetchall()
        dk_wall = round(time.perf_counter() - t0, 2)
        duck_picks = [(int(v), int(d)) for _, v, d in
                      sorted(duck, key=lambda r: r[0])]
        rec = {
            "n_vectors": n_vec,
            "spark_wall_s": sp_wall,
            "duck_wall_s": dk_wall,
            "ratio": round(sp_wall / dk_wall, 3) if dk_wall else None,
            "vectors_per_s_per_round": round(n_vec * 8 / sp_wall)
            if sp_wall else None,
            "picks_match": picks == duck_picks,
            "picks": picks,
        }
        print(json.dumps({"kcenter_full": rec}), flush=True)


if __name__ == "__main__":
    main()

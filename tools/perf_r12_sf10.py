"""r12 sf10 measurements (run: python tools/perf_r12_sf10.py [sf_dir]):

1. IVF-PQ index amortization (VERDICT r11 item 1): inline encode+serve
   vs write_ann_index build + indexed serve — the build-once/serve-many
   break-even.
2. semantic_dedup at scale (VERDICT r11 item 3): unscoped 200k-vector
   run with the n_centroids knob raised to bound the in-cell quadratic.
3. ext_text_bpe / ext_text_quality_score Spark vs DuckDB, SAME-SESSION
   interleaved (the PERF.md A/B methodology — never separate JVMs).

All numbers go to PERF.md by hand; this script exists so the next round
can re-run the measurement instead of trusting the prose.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.operators import similarity as S  # noqa: E402
from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 3), r


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark(
        "perf-r12", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    corpus = emb.filter(F.col("vec_id") >= 20)
    centroids = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 36))
    codebook = emb.filter((F.col("vec_id") >= 36) & (F.col("vec_id") < 52))

    # -- 1. IVF-PQ amortization ------------------------------------------
    inline = lambda: noop(  # noqa: E731
        S.ivf_pq_topk_fixed(corpus, queries, centroids, codebook,
                            m=8, k=3, n_probe=4)
    )
    idx_path = "/tmp/r12_annidx"
    for name, fn in [
        ("ivfpq_inline_warmup", inline),
        ("ivfpq_inline", inline),
        ("ivfpq_index_build", lambda: S.write_ann_index(
            corpus, centroids, codebook, idx_path, m=8)),
        ("ivfpq_indexed_serve_warmup", lambda: noop(S.ivf_pq_topk_indexed(
            spark, idx_path, queries, k=3, n_probe=4))),
        ("ivfpq_indexed_serve", lambda: noop(S.ivf_pq_topk_indexed(
            spark, idx_path, queries, k=3, n_probe=4))),
        ("ivfpq_indexed_serve2", lambda: noop(S.ivf_pq_topk_indexed(
            spark, idx_path, queries, k=3, n_probe=4))),
    ]:
        dt, _ = t(fn)
        print(f"{name}: {dt} s", flush=True)

    # -- 2. semantic_dedup unscoped, n_centroids knob --------------------
    for ncent in (16, 1024):
        cents = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 20 + ncent))
        run = lambda: noop(  # noqa: E731
            D.semantic_dedup(emb, cents, dim=64, threshold=0.35)
        )
        dt, _ = t(run)
        dt2, _ = t(run)
        print(f"semantic_dedup ncent={ncent}: cold {dt} s, warm {dt2} s",
              flush=True)

    # -- 3. BPE + quality score, Spark vs DuckDB interleaved -------------
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    from flink_cdc_multi_spark.plans.extensions import (
        ext_text_bpe,
        ext_text_quality_score,
    )

    for name, qfn in (("ext_text_bpe", ext_text_bpe),
                      ("ext_text_quality_score", ext_text_quality_score)):
        plan = qfn(spark, sf_dir)
        sql = ALL_ORACLE_SQL[name]
        noop(plan)  # spark warm
        con.execute(sql).fetchall()  # duck warm
        sp, dk = [], []
        for _ in range(2):  # ABAB interleave
            dt, _ = t(lambda: noop(plan))
            sp.append(dt)
            dt, _ = t(lambda: con.execute(sql).fetchall())
            dk.append(dt)
        print(f"{name}: spark {min(sp)} s, duckdb {min(dk)} s, "
              f"ratio {round(min(sp)/min(dk), 2)}", flush=True)


if __name__ == "__main__":
    main()

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

    if want("tfidf_500k"):
        ab(
            "tfidf_500k",
            ALL_QUERIES["ext_text_tfidf"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_text_tfidf"],
            lambda p: tuple(
                p.agg(
                    F.count("*"), F.sum("tf"), F.sum("df"), F.sum("rnk")
                ).collect()[0]
            ),
            "CAST(SUM(tf) AS BIGINT), CAST(SUM(df) AS BIGINT), "
            "CAST(SUM(rnk) AS BIGINT)",
        )

    if want("hll_merge_500k"):
        ab(
            "hll_merge_500k",
            ALL_QUERIES["ext_sketch_hll_merge"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_sketch_hll_merge"],
            lambda p: tuple(
                p.agg(
                    F.count("*"),
                    F.sum("n_shards"),
                    F.sum("harmonic_scaled"),
                    F.sum("est_distinct"),
                ).collect()[0]
            ),
            "CAST(SUM(n_shards) AS BIGINT), "
            "CAST(SUM(harmonic_scaled) AS BIGINT), "
            "CAST(SUM(est_distinct) AS BIGINT)",
        )

    if want("kmv_jaccard_500k"):
        ab(
            "kmv_jaccard_500k",
            ALL_QUERIES["ext_sketch_kmv_jaccard"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_sketch_kmv_jaccard"],
            lambda p: tuple(
                p.agg(
                    F.count("*"), F.sum("k_u"), F.sum("n_match")
                ).collect()[0]
            ),
            "CAST(SUM(k_u) AS BIGINT), CAST(SUM(n_match) AS BIGINT)",
        )

    if want("weighted_500k"):
        ab(
            "weighted_500k",
            ALL_QUERIES["ext_sample_weighted"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_sample_weighted"],
            lambda p: tuple(
                p.agg(
                    F.count("*"),
                    F.sum("doc_id"),
                    F.sum(F.col("h") % 1000000007),
                    F.sum("w"),
                ).collect()[0]
            ),
            "CAST(SUM(doc_id) AS BIGINT), "
            "CAST(SUM(h % 1000000007) AS BIGINT), CAST(SUM(w) AS BIGINT)",
        )

    if want("ijoin_10m") or want("zorder_10m"):
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )

    if want("ijoin_10m"):
        ab(
            "ijoin_10m",
            ALL_QUERIES["ext_events_interval_join"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_events_interval_join"],
            lambda p: tuple(
                p.agg(
                    F.count("*"), F.sum("n_events"), F.sum("n_concurrent")
                ).collect()[0]
            ),
            "CAST(SUM(n_events) AS BIGINT), "
            "CAST(SUM(n_concurrent) AS BIGINT)",
        )
        ab(
            "zorder_10m",
            ALL_QUERIES["ext_layout_zorder"](spark, sf_dir),
            con,
            ALL_ORACLE_SQL["ext_layout_zorder"],
            lambda p: tuple(
                p.agg(
                    F.count("*"),
                    F.sum("n"),
                    # mod-sum: a plain SUM of 256 per-group key sums can
                    # exceed int64 at 10M rows x 2^42-scale keys
                    F.sum(F.col("sum_z") % 1000000007),
                ).collect()[0]
            ),
            "CAST(SUM(n) AS BIGINT), "
            "CAST(SUM(sum_z % 1000000007) AS BIGINT)",
        )

    if want("zorder_prune_10m"):
        # Spark-only layout A/B: write the sf10 events (user_id, value
        # dims) z-ordered vs single-column-sorted, then time the SAME
        # selective 2-D aggregate on both — the win is parquet row-group
        # pruning from pushed min/max filters on BOTH dimensions.
        import shutil
        import tempfile

        from flink_cdc_multi_spark.operators.layout import zorder_layout

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"
        )
        lo_u, hi_u = [
            int(x)
            for x in ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
        ]
        base = tempfile.mkdtemp(prefix="zorder_ab_")
        zdir, ldir = f"{base}/z", f"{base}/l"

        def timed_write(df, d):
            # min of 2 — the first write pays JVM/page-cache warmup and
            # ambient waves land on single-shot write walls
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.parquet(d, mode="overwrite")
                ts.append(round(time.perf_counter() - t0, 2))
            return min(ts)

        z_write = timed_write(
            zorder_layout(ev, ["user_id", "value"], n_buckets=64,
                          n_partitions=64),
            zdir,
        )
        l_write = timed_write(
            ev.repartitionByRange(64, "user_id")
            .sortWithinPartitions("user_id"),
            ldir,
        )

        # three predicate shapes; the headline is VALUE-ONLY — the
        # second sort dimension, where a single-column layout cannot
        # prune anything by construction
        u_cut = lo_u + max(1, (hi_u - lo_u) // 64)
        preds = {
            "value_only": (None, (10.0, 11.0)),
            "user_only": ((lo_u, u_cut), None),
            "both": ((lo_u, u_cut), (10.0, 11.0)),
        }

        def pred_sql(p):
            u, v = p
            cl = []
            if u:
                cl.append(f"user_id BETWEEN {u[0]} AND {u[1]}")
            if v:
                cl.append(f"value BETWEEN {v[0]} AND {v[1]}")
            return " AND ".join(cl)

        def scan(d, p):
            t0 = time.perf_counter()
            row = (
                spark.read.parquet(d)
                .filter(pred_sql(p))
                .agg(F.count("*"), F.sum("event_id"))
                .collect()[0]
            )
            return round(time.perf_counter() - t0, 3), (
                int(row[0]), int(row[1] or 0)
            )

        # The pruning evidence at local[32] is NOT wall-clock (a 10M-row
        # scan sits on the 64-task floor either way) but what a
        # stats-aware reader — parquet row-group pruning, manifest
        # dt-stats, Delta data skipping — would actually read: files
        # whose (user_id, value) min/max rectangle intersects the
        # predicate, and the rows they contain.
        import glob

        import pyarrow.parquet as pqt

        def file_rects(d):
            out = []
            for f in sorted(glob.glob(f"{d}/part-*.parquet")):
                md = pqt.ParquetFile(f).metadata
                names = [
                    md.row_group(0).column(i).path_in_schema
                    for i in range(md.row_group(0).num_columns)
                ]
                ui, vi = names.index("user_id"), names.index("value")
                mu = xu = mv = xv = None
                nrows = 0
                for g in range(md.num_row_groups):
                    su = md.row_group(g).column(ui).statistics
                    sv = md.row_group(g).column(vi).statistics
                    nrows += md.row_group(g).num_rows
                    mu = su.min if mu is None else min(mu, su.min)
                    xu = su.max if xu is None else max(xu, su.max)
                    mv = sv.min if mv is None else min(mv, sv.min)
                    xv = sv.max if xv is None else max(xv, sv.max)
                out.append((mu, xu, mv, xv, nrows))
            return out

        def covered(rects, p):
            u, v = p
            hf = hr = 0
            for mu, xu, mv, xv, n in rects:
                if u and (xu < u[0] or mu > u[1]):
                    continue
                if v and (xv < v[0] or mv > v[1]):
                    continue
                hf += 1
                hr += n
            return hf, hr

        zrects, lrects = file_rects(zdir), file_rects(ldir)
        rec = {
            "n_rows": ev.count(),
            "z_write_s": z_write,
            "linear_write_s": l_write,
            "n_files": len(zrects),
        }
        for pname, p in preds.items():
            zf, zr = covered(zrects, p)
            lf, lr = covered(lrects, p)
            zt, zchk = scan(zdir, p)
            lt, lchk = scan(ldir, p)
            rec[pname] = {
                "z_files_hit": zf,
                "linear_files_hit": lf,
                "z_rows_covered": zr,
                "linear_rows_covered": lr,
                "skip_ratio": round(lr / zr, 2) if zr else None,
                "z_scan_s": zt,
                "linear_scan_s": lt,
                "check_match": zchk == lchk,
                "matched_rows": zchk[0],
            }
        print(json.dumps({"zorder_prune_10m": rec}), flush=True)
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

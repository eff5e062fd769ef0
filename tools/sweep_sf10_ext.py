"""sf10 sweep of the heavy LLM-ext operators (VERDICT r9 item 1).

Extends the r9 q24-q28 methodology — interleaved Spark/DuckDB runs inside
ONE session, min-of-N, executed-plan reads done separately — to the
flagship LLM-pipeline operators whose 100 TB claims previously rested on
argued shapes: commonness, minhash/simhash (gated scope AND unscoped full
table), contamination, triangles, ANN (lsh/ivf), embedding-LSH dedup.

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf10 100
    python tools/sweep_sf10_ext.py /tmp/sf10 [query ...]

Notes on the unscoped variants over the REPLICATED fixture: gen_scaled_sf
replicates sf0.1 text/embeddings 100x with shifted ids, so every document
belongs to an identical-copy cluster of ~100 — a deliberately dup-heavy
dedup workload (pair output ~C(100,2) per cluster). That stresses exactly
what a dedup operator must survive at scale: large duplicate cliques =
hot LSH buckets. Triangle counting is run at a 20-replica scope instead:
C(100,3) ~ 161k triangles PER CLIQUE x 5k cliques is a data-pathological
output (real pipelines run CC/dedup before graph stats — see
ext_dedup_clusters), not an operator deficiency; the 20-replica point
(C(20,3)=1.1k/clique) keeps the output realistic while still 40x the
gate-scope edge count.

DuckDB twins run the registered oracle SQL (scope predicates textually
widened for the unscoped variants) in a SUBPROCESS with a hard timeout —
an oracle that cannot finish is recorded as "timeout", not skipped.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL, ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import _ngram_pair_candidates  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
DUCK_TIMEOUT = int(os.environ.get("SWEEP_DUCK_TIMEOUT", "600"))


def _minhash_unscoped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_md5(docs, num_hashes=16, bands=4)


def _simhash_unscoped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs_md5(docs, max_hamming=3)


def _minhash_fast_compact(spark, sf_dir):
    """The xxhash64 64-hash/16-band fast path as shipped (compact bucket
    join + pair dropDuplicates)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.5)


def _minhash_fast_fused(spark, sf_dir):
    """Fused twin of the fast path: same signatures/banding, pair-dedup
    as the first-equal-band filter (r9 measured this LOSING at sf1
    10-cliques, 7.4 s vs 5.4 s, on shuffle bytes; the sf10 100-clique
    question is whether compact's dedup exchange hits the simhash skew
    wall)."""
    from pyspark.sql import functions as FF

    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, num_hashes=64)
    cand = D._banded_pairs_fused(sig, bands=16, rows_per_band=4)
    agree = FF.size(
        FF.filter(FF.zip_with("sa", "sb", lambda x, y: x == y), lambda m: m)
    )
    est = FF.round(agree / FF.lit(64), 4)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(FF.col("est_jaccard") >= 0.5)
        .select("a_id", "b_id", "est_jaccard")
    )


def _clusters_unscoped(spark, sf_dir):
    """Connected components over the FULL 500k-doc near-dup pair graph
    (fast-path minhash pairs, ~27M edges of 100-cliques): the closure
    step PERF.md's triangle note leans on ("real pipelines run
    clustering before graph stats") measured at the scale it defends.
    neardup_clusters is an eager fixpoint, so the cost lands in
    plan_build_s, not the noop write."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).select("a_id", "b_id")
    return D.neardup_clusters(docs.select("doc_id"), pairs, "doc_id")


def _triangles_20rep(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100000)
    e = _ngram_pair_candidates(docs, mult=50).select(
        F.col("a_id").alias("u"), F.col("b_id").alias("v")
    )
    uv, vw = e.alias("uv"), e.alias("vw")
    wedge = uv.join(vw, F.col("uv.v") == F.col("vw.u")).select(
        F.col("uv.u").alias("u"), F.col("uv.v").alias("v"), F.col("vw.v").alias("w")
    )
    tri = wedge.join(
        e.select(F.col("u").alias("cu"), F.col("v").alias("cw")),
        (F.col("u") == F.col("cu")) & (F.col("w") == F.col("cw")),
    ).select("u", "v", "w")
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )


def _widen(sql: str, *preds: str) -> str:
    out = sql
    for p in preds:
        assert p in out, f"scope predicate {p!r} not found in oracle SQL"
        out = out.replace(p, "TRUE")
    return out


# name -> (spark_builder, duckdb_sql_or_None, n_runs)
def build_targets(sf_dir: str):
    t = {
        "ext_text_commonness": (ALL_QUERIES["ext_text_commonness"],
                                ALL_ORACLE_SQL["ext_text_commonness"], 3),
        "ext_contamination": (ALL_QUERIES["ext_contamination"],
                              ALL_ORACLE_SQL["ext_contamination"], 3),
        "ext_dedup_minhash_gated": (ALL_QUERIES["ext_dedup_minhash"],
                                    ALL_ORACLE_SQL["ext_dedup_minhash"], 3),
        "ext_dedup_simhash_gated": (ALL_QUERIES["ext_dedup_simhash"],
                                    ALL_ORACLE_SQL["ext_dedup_simhash"], 3),
        "minhash_unscoped": (_minhash_unscoped,
                             _widen(ALL_ORACLE_SQL["ext_dedup_minhash"],
                                    "doc_id < 300"), 2),
        "simhash_unscoped": (_simhash_unscoped,
                             _widen(ALL_ORACLE_SQL["ext_dedup_simhash"],
                                    "doc_id < 300"), 2),
        "minhash_fast_compact": (_minhash_fast_compact, None, 1),
        "minhash_fast_fused": (_minhash_fast_fused, None, 1),
        "clusters_unscoped": (_clusters_unscoped, None, 1),
        "triangles_20rep": (_triangles_20rep,
                            _widen(ALL_ORACLE_SQL["ext_graph_triangles"],
                                   "doc_id < 500"), 2),
        "ext_ann_lsh": (ALL_QUERIES["ext_ann_lsh"],
                        ALL_ORACLE_SQL["ext_ann_lsh"], 3),
        "ext_ann_ivf": (ALL_QUERIES["ext_ann_ivf"],
                        ALL_ORACLE_SQL["ext_ann_ivf"], 3),
        "ext_dedup_embedding_lsh": (ALL_QUERIES["ext_dedup_embedding_lsh"],
                                    ALL_ORACLE_SQL["ext_dedup_embedding_lsh"], 3),
    }
    return t


_DUCK_RUNNER = r"""
import json, sys, time
import duckdb
sf_dir, sql, runs = sys.argv[1], sys.stdin.read(), int(sys.argv[2])
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute("SET enable_progress_bar=false")  # bar shares stdout with the JSON line
for t in {tables!r}:
    con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{sf_dir}}/{{t}}.parquet')")
times = []
n = None
for i in range(runs):
    t0 = time.perf_counter()
    n = len(con.execute(sql).fetchall())
    times.append(round(time.perf_counter() - t0, 4))
print(json.dumps({{"times": times, "rows": n}}))
"""


def duck_run(sf_dir: str, sql: str, runs: int):
    """One DuckDB timing batch in a subprocess (hard timeout, cold start —
    first run is the warm-up, min excludes it when runs > 1)."""
    try:
        p = subprocess.run(
            [sys.executable, "-c", _DUCK_RUNNER.format(tables=TABLES), sf_dir,
             str(runs + 1)],
            input=sql, capture_output=True, text=True, timeout=DUCK_TIMEOUT,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout >{DUCK_TIMEOUT}s"}
    if p.returncode != 0:
        return {"error": p.stderr.strip()[-200:]}
    try:
        tail = p.stdout.strip().splitlines()[-1]
        out = json.loads(tail[tail.index("{"):])
    except (ValueError, IndexError):
        return {"error": f"unparseable duckdb stdout: {p.stdout[-150:]!r}"}
    out["min"] = min(out["times"][1:]) if len(out["times"]) > 1 else out["times"][0]
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    targets = build_targets(sf_dir)
    only = sys.argv[2:] or list(targets)
    spark = get_spark("sf10-ext-sweep")

    results: dict[str, dict] = {}
    runs_override = os.environ.get("SWEEP_RUNS")
    for name in only:
        if name not in targets and name in ALL_QUERIES:
            # any registered query sweeps as-is with its oracle (scoped
            # predicates stay — meaningful only for queries whose scope
            # is the full table, e.g. the events family)
            targets[name] = (ALL_QUERIES[name], ALL_ORACLE_SQL.get(name), 2)
        fn, sql, runs = targets[name]
        if runs_override:
            runs = int(runs_override)
        rec: dict = {}
        print(f"=== {name} ===", flush=True)
        try:
            t0 = time.perf_counter()
            plan = fn(spark, sf_dir)
            rec["plan_build_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            rec["rows"] = plan.count()  # warm + output cardinality
            rec["first_run_s"] = round(time.perf_counter() - t0, 3)
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                plan.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 4))
            rec["spark_times"] = times
            rec["spark_min"] = min(times)
        except Exception as e:  # noqa: BLE001
            rec["spark_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        if sql is not None and "spark_error" not in rec:
            rec["duckdb"] = duck_run(sf_dir, sql, runs)
            dmin = rec["duckdb"].get("min")
            if dmin:
                rec["ratio"] = round(rec["spark_min"] / dmin, 2)
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print("\n==== SUMMARY ====")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""r14 sf10 scale measurements (VERDICT r13 item 1), same-session
interleaved ABAB Spark/DuckDB (the PERF.md methodology — one process,
alternated engines, min-of-N; never separate JVMs).

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf10 100
    python tools/perf_r14_sf10.py /tmp/sf10 [target ...]

Targets (the r13-gated operators without scale evidence):

- pagerank_e20 / pagerank_e100, triangles_e20: the graph operators over
  the LSH pair graph they ride in production — edges are
  minhash_lsh_pairs output persisted to parquet ONCE (untimed; pair-gen
  cost is already measured in PERF.md r10), then graph_pagerank_over /
  graph_triangles_over vs hand-twinned DuckDB SQL over the SAME parquet.
  e100 = the full 500k-doc 100-clique graph (~25M oriented edges) — the
  hot-clique skew fixture the verdict asks for; e20 = the 20-replica
  scope (doc_id < 100000, ~4.7M edges). Triangles run on e20 only:
  100-cliques yield C(100,3)=161k triangles/clique — output-pathological
  by the documented PERF.md r10 note, not an operator deficiency.
- images_510k: dhash_pairs' fused pigeonhole join on a 510k-hash
  synthetic corpus — 166,667 planted groups of 3 (base / 1-bit-flipped
  near-copy / far decoy) plus 100 hot 100-cliques of identical hashes
  (the skew fixture) — vs the SAME fused algorithm hand-twinned in
  DuckDB (4x14-bit blocks, first-equal-block emit-once filter as a
  row-local predicate). Decode throughput is measured separately
  (PERF.md r13 per-format dhash table); this isolates the pair join.
- audiohash, spans_drop: the gate queries at sf10 full-table scope vs
  their registered oracles.

Every target cross-checks row count + integer checksum between the two
engines before timing is trusted. Numbers go to PERF.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL, ALL_QUERIES  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import (  # noqa: E402
    graph_pagerank_over,
    graph_triangles_over,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def build_edges(spark, sf_dir: str, scope: int | None, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    docs = load_table(spark, sf_dir, "documents")
    if scope is not None:
        docs = docs.filter(F.col("doc_id") < scope)
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).select("a_id", "b_id")
    pairs.write.mode("overwrite").parquet(path)


def build_image_hashes(spark, path: str) -> None:
    """510k synthetic dhash56 corpus: 166,667 groups of 3 (base at a
    pseudorandom 56-bit point, near-copy at hamming 1, far decoy) over
    ids 0..500000, plus 100 hot 100-cliques of IDENTICAL hashes on ids
    500001..510000 — the duplicate-clique regime the fused plan exists
    for. Expression-built (no driver-side 510k list)."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    m56 = (1 << 56) - 1
    # group g = id // 3: member 0 base (pseudorandom 56-bit point),
    # member 1 = base ^ one bit (hamming 1, a true near-dup), member 2 =
    # base ^ alternating mask (hamming ~28, excluded decoy); ids
    # 500001..510000 are 100 hot 100-cliques of IDENTICAL hashes
    base = spark.range(0, 510001).select(
        F.col("id").alias("doc_id"),
        F.expr(f"""CAST(CASE WHEN id <= 500000 THEN
            (((id div 3) * 2654435761) & {m56}) ^
            (CASE WHEN id % 3 = 1
                  THEN shiftleft(1L, cast((id div 3) % 56 as int))
                  WHEN id % 3 = 2 THEN {0x55555555555555}
                  ELSE 0 END)
          ELSE ((((id - 500001) div 100) * 888888877) & {m56})
          END AS LONG)""").alias("dhash"),
    )
    base.write.mode("overwrite").parquet(path)


def pagerank_twin_sql(edges_path: str) -> str:
    it = """
    , p{b} AS (
      SELECT ed.v AS id, 150000 + (85 * SUM(p{a}.pr // deg.dg)) // 100 AS pr
      FROM ed JOIN p{a} ON p{a}.id = ed.u JOIN deg ON deg.u = ed.u
      GROUP BY ed.v
    )"""
    return (f"""
    WITH e AS (SELECT a_id, b_id FROM read_parquet('{edges_path}/*.parquet')),
    ed AS (SELECT a_id u, b_id v FROM e UNION ALL SELECT b_id, a_id FROM e),
    deg AS (SELECT u, COUNT(*) AS dg FROM ed GROUP BY u),
    p0 AS (SELECT u AS id, 1000000::BIGINT AS pr FROM deg)"""
            + it.format(a=0, b=1) + it.format(a=1, b=2) + it.format(a=2, b=3)
            + "\n    SELECT id AS doc_id, CAST(pr AS BIGINT) AS pr FROM p3")


def labelprop_twin_sql(edges_path: str) -> str:
    """3 unrolled synchronous LPA rounds (r16) over the same edge
    parquet — max-count-then-min-label, count CTEs MATERIALIZED (each is
    referenced twice; DuckDB's default inlining re-evaluates the chain
    exponentially in rounds — the kcenter lesson)."""
    it = """
    , c{b} AS MATERIALIZED (
      SELECT ed.v, l{a}.lbl, COUNT(*) AS c FROM ed
      JOIN l{a} ON l{a}.id = ed.u GROUP BY ed.v, l{a}.lbl
    ), m{b} AS (
      SELECT v, MAX(c) AS mc FROM c{b} GROUP BY v
    ), l{b} AS (
      SELECT c{b}.v AS id, MIN(c{b}.lbl) AS lbl
      FROM c{b} JOIN m{b} ON c{b}.v = m{b}.v AND c{b}.c = m{b}.mc
      GROUP BY c{b}.v
    )"""
    return (f"""
    WITH e AS (SELECT a_id, b_id FROM read_parquet('{edges_path}/*.parquet')),
    ed AS (SELECT a_id u, b_id v FROM e UNION ALL SELECT b_id, a_id FROM e),
    l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM ed)"""
            + it.format(a=0, b=1) + it.format(a=1, b=2) + it.format(a=2, b=3)
            + "\n    SELECT id AS doc_id, CAST(lbl AS BIGINT) AS lbl FROM l3")


def triangles_twin_sql(edges_path: str) -> str:
    return f"""
    WITH e AS (SELECT a_id u, b_id v FROM read_parquet('{edges_path}/*.parquet')),
    wedge AS (
      SELECT uv.u, uv.v, vw.v AS w FROM e uv JOIN e vw ON uv.v = vw.u
    ), tri AS (
      SELECT wedge.u, wedge.v, wedge.w
      FROM wedge JOIN e c ON c.u = wedge.u AND c.v = wedge.w
    ), x AS (
      SELECT u AS doc_id FROM tri UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM x GROUP BY doc_id
    """


def images_twin_sql(hash_path: str) -> str:
    """The SAME fused pigeonhole algorithm dhash_pairs runs, as DuckDB
    SQL: 4x14-bit block join + row-local first-equal-block emit-once
    filter + bit_count verify — algorithm-equal comparison, not the
    all-pairs O(n^2) strawman."""
    width, blocks, mask = 14, 4, (1 << 14) - 1

    def first_eq(k: int) -> str:
        conds = [f"((ha >> {j * width}) & {mask}) <> ((hb >> {j * width}) & {mask})"
                 for j in range(k)]
        return " AND ".join(conds) if conds else "TRUE"

    return f"""
    WITH t AS (SELECT doc_id, dhash FROM read_parquet('{hash_path}/*.parquet')),
    b AS (
      SELECT doc_id, dhash, u.k AS k, (dhash >> (14 * u.k)) & {mask} AS blk
      FROM t, unnest(range({blocks})) u(k)
    ), cand AS (
      SELECT a.doc_id a_id, c.doc_id b_id, a.dhash ha, c.dhash hb, a.k
      FROM b a JOIN b c ON a.k = c.k AND a.blk = c.blk AND a.doc_id < c.doc_id
    )
    SELECT a_id, b_id, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 3
      AND CASE k WHEN 0 THEN {first_eq(0)} WHEN 1 THEN {first_eq(1)}
                 WHEN 2 THEN {first_eq(2)} ELSE {first_eq(3)} END
    """


def ab(name: str, plan, con, sql: str, spark_checksum, duck_checksum,
       runs: int = 2) -> dict:
    rec: dict = {}
    t0 = time.perf_counter()
    plan.write.format("noop").mode("overwrite").save()  # Spark warm
    rec["spark_cold_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    con.execute(sql).fetchall()  # DuckDB warm
    rec["duck_cold_s"] = round(time.perf_counter() - t0, 3)
    sp, dk = [], []
    for _ in range(runs):  # ABAB
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
    # cross-engine honesty: count + integer checksum must agree
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
    spark = get_spark(
        "perf-r14", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict = {}

    def want(n: str) -> bool:
        return not only or n in only

    e20 = "/tmp/r14_edges20"
    e100 = "/tmp/r14_edges100"
    imgs = "/tmp/r14_imghash510k"

    if want("pagerank_e20") or want("triangles_e20") or want("pagerank_e20_bcast"):
        t0 = time.perf_counter()
        build_edges(spark, sf_dir, 100000, e20)
        print(f"edges20 built in {time.perf_counter()-t0:.1f}s", flush=True)
    if want("pagerank_e100") or want("pagerank_e100_bcast"):
        t0 = time.perf_counter()
        build_edges(spark, sf_dir, None, e100)
        print(f"edges100 built in {time.perf_counter()-t0:.1f}s", flush=True)
    if want("images_510k"):
        build_image_hashes(spark, imgs)

    def pr_checksum(plan):
        r = plan.agg(F.count("*"), F.sum("pr")).collect()[0]
        return (r[0], r[1])

    def tri_checksum(plan):
        r = plan.agg(F.count("*"), F.sum("n_triangles")).collect()[0]
        return (r[0], r[1])

    def img_checksum(plan):
        r = plan.agg(F.count("*"), F.sum("hamming")).collect()[0]
        return (r[0], r[1])

    if want("pagerank_e20"):
        plan = graph_pagerank_over(spark.read.parquet(e20))
        results["pagerank_e20"] = ab(
            "pagerank_e20", plan, con, pagerank_twin_sql(e20),
            pr_checksum, "SUM(pr)")
    if want("pagerank_e100"):
        plan = graph_pagerank_over(spark.read.parquet(e100))
        results["pagerank_e100"] = ab(
            "pagerank_e100", plan, con, pagerank_twin_sql(e100),
            pr_checksum, "SUM(pr)")
    if want("pagerank_e100_bcast"):
        plan = graph_pagerank_over(spark.read.parquet(e100),
                                   broadcast_ranks=True)
        results["pagerank_e100_bcast"] = ab(
            "pagerank_e100_bcast", plan, con, pagerank_twin_sql(e100),
            pr_checksum, "SUM(pr)")
    if want("pagerank_e20_bcast"):
        plan = graph_pagerank_over(spark.read.parquet(e20),
                                   broadcast_ranks=True)
        results["pagerank_e20_bcast"] = ab(
            "pagerank_e20_bcast", plan, con, pagerank_twin_sql(e20),
            pr_checksum, "SUM(pr)")
    if want("labelprop_e100") or want("labelprop_e100_bcast"):
        from flink_cdc_multi_spark.plans.extensions import (
            graph_labelprop_over,
        )

        build_edges(spark, sf_dir, None, e100)

        def lp_checksum(plan):
            r = plan.agg(
                F.count("*"), F.sum(F.col("lbl") % 1000000007)
            ).collect()[0]
            return (r[0], r[1])

        for tgt, bc in (("labelprop_e100", False),
                        ("labelprop_e100_bcast", True)):
            if want(tgt):
                plan = graph_labelprop_over(spark.read.parquet(e100),
                                            broadcast_labels=bc)
                results[tgt] = ab(
                    tgt, plan, con, labelprop_twin_sql(e100),
                    lp_checksum, "SUM(lbl % 1000000007)")

    if want("triangles_e20"):
        plan = graph_triangles_over(spark.read.parquet(e20))
        results["triangles_e20"] = ab(
            "triangles_e20", plan, con, triangles_twin_sql(e20),
            tri_checksum, "SUM(n_triangles)")
    if want("images_510k"):
        from flink_cdc_multi_spark.operators import multimodal as M

        plan = M.dhash_pairs(spark.read.parquet(imgs), max_hamming=3)
        results["images_510k"] = ab(
            "images_510k", plan, con, images_twin_sql(imgs),
            img_checksum, "SUM(hamming)")
    if want("audiohash"):
        plan = ALL_QUERIES["ext_multimodal_audiohash"](spark, sf_dir)
        # checksum mod a prime: SUM over 500k 56-bit hashes overflows
        # int64 in ANSI mode
        results["audiohash"] = ab(
            "audiohash", plan, con, ALL_ORACLE_SQL["ext_multimodal_audiohash"],
            lambda p: tuple(
                p.agg(F.count("*"),
                      F.sum(F.col("ahash") % 1000003)).collect()[0]),
            "SUM(ahash % 1000003)")
    if want("spans_drop"):
        plan = ALL_QUERIES["ext_dedup_spans_drop"](spark, sf_dir)
        results["spans_drop"] = ab(
            "spans_drop", plan, con, ALL_ORACLE_SQL["ext_dedup_spans_drop"],
            lambda p: tuple(
                p.agg(F.count("*"), F.sum("n_removed")).collect()[0]),
            "SUM(n_removed)")

    print("\n==== SUMMARY ====")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

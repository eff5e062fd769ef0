"""Streaming bounded top-k (streaming/stateful.topk_freq_stream) — the
Misra–Gries heavy-hitter maintainer (r17, VERDICT r16 item 1).

Unlike the max/sum sketches (HLL/CMS/histogram), the MG fold is LOSSY, so
the result depends on the batch-split tree — the pins here are therefore:
(1) the stream over any split equals the shared Python kernel replaying
the SAME splits (the cms_indices_py pinning pattern), (2) a single batch
equals the batch query's compress, (3) state survives a checkpoint
restart bit-identically, (4) the MG lower-bound guarantee vs exact
counts, and (5) the batch operator/oracle semantics on crafted corpora."""

import json

from flink_cdc_multi_spark.operators.sketch import (
    MG_K,
    mg_compress_py,
    mg_merge_py,
)
from flink_cdc_multi_spark.streaming.stateful import topk_freq_stream


def _feed_file(feed, name, rows):
    (feed / name).write_text("\n".join(json.dumps(r) for r in rows))


def _rows(g, values):
    return [{"g": g, "v": v} for v in values]


def _latest(emissions):
    """Last summary per key across ordered (batch, rows) captures."""
    out = {}
    for _b, rows in emissions:
        per_key = {}
        for r in rows:
            per_key.setdefault(r["g"], []).append(
                (r["rnk"], r["v"], r["est_lb"])
            )
        for g, lst in per_key.items():
            out[g] = sorted(lst)
    return out


def _run_stream(spark, feed, ckpt, k=None):
    stream = (
        spark.readStream.schema("g string, v string")
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    out = topk_freq_stream(stream, "g", "v", k=k)
    emissions = []
    q = (
        out.writeStream.foreachBatch(
            lambda df, b: emissions.append((b, df.collect()))
        )
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return emissions


def _py_expect(batches, k):
    """The shared-kernel replay: fold each batch's exact counts through
    mg_merge_py in order, then rank (est_lb DESC, value ASC)."""
    state: dict = {}
    for rows in batches:
        counts: dict = {}
        for r in rows:
            if r["v"] is None:
                continue
            counts[r["v"]] = counts.get(r["v"], 0) + 1
        if counts:
            state = mg_merge_py(state, counts, k)
    top = sorted(state.items(), key=lambda vc: (-vc[1], vc[0]))
    return sorted((i + 1, v, c) for i, (v, c) in enumerate(top))


def test_stream_matches_kernel_replay_across_splits(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    k = 3  # tiny budget so compression actually fires
    b1 = (_rows("en", ["a"] * 5 + ["b"] * 4 + ["c"] * 3 + ["d", "e"])
          + _rows("fr", ["x"] * 2))
    b2 = (_rows("en", ["d"] * 6 + ["e"] * 2 + ["a"])
          + [{"g": "en", "v": None}])  # NULL is not a value
    _feed_file(feed, "f1.jsonl", b1)
    _feed_file(feed, "f2.jsonl", b2)
    got = _latest(_run_stream(spark, feed, tmp_path / "ckpt", k=k))
    assert got["en"] == _py_expect(
        [[r for r in b if r["g"] == "en"] for b in (b1, b2)], k
    )
    assert got["fr"] == [(1, "x", 2)]


def test_single_batch_equals_batch_compress(spark, tmp_path):
    """One micro-batch == mg_compress_py of the exact counts — the
    degenerate case where stream and batch MUST agree exactly."""
    feed = tmp_path / "feed"
    feed.mkdir()
    rows = _rows("en", ["a"] * 7 + ["b"] * 5 + ["c"] * 2 + ["d"])
    _feed_file(feed, "f1.jsonl", rows)
    got = _latest(_run_stream(spark, feed, tmp_path / "ckpt", k=2))
    want = mg_compress_py({"a": 7, "b": 5, "c": 2, "d": 1}, 2)
    top = sorted(want.items(), key=lambda vc: (-vc[1], vc[0]))
    assert got["en"] == sorted(
        (i + 1, v, c) for i, (v, c) in enumerate(top)
    )
    # and the guarantee: every counter is a lower bound on the true count
    truth = {"a": 7, "b": 5, "c": 2, "d": 1}
    for _, v, lb in got["en"]:
        assert lb <= truth[v]


def test_stream_state_survives_restart(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = tmp_path / "ckpt"
    b1 = _rows("en", ["a"] * 5 + ["b"] * 3 + ["c"])
    _feed_file(feed, "f1.jsonl", b1)
    _run_stream(spark, feed, ckpt, k=2)
    # resume: the restarted query folds ONLY the new batch onto the
    # checkpointed counters
    b2 = _rows("en", ["c"] * 4 + ["b"])
    _feed_file(feed, "f2.jsonl", b2)
    got = _latest(_run_stream(spark, feed, ckpt, k=2))
    assert got["en"] == _py_expect([b1, b2], 2)


def test_mg_guarantee_and_heavy_hitter_survival():
    """Kernel-level MG invariants on a hostile distribution: counters are
    lower bounds, undercount per value ≤ N/(k+1) per compress, and a
    value holding a majority of the stream always survives."""
    import random

    random.seed(7)
    truth: dict = {}
    state: dict = {}
    n = 0
    for _ in range(20):  # 20 batches
        counts: dict = {}
        for _ in range(200):
            v = "HEAVY" if random.random() < 0.55 else f"t{random.randrange(50)}"
            counts[v] = counts.get(v, 0) + 1
        for v, c in counts.items():
            truth[v] = truth.get(v, 0) + c
        n += 200
        state = mg_merge_py(state, counts, MG_K)
    assert len(state) <= MG_K
    for v, lb in state.items():
        assert 0 < lb <= truth[v]
    # 55% mass ≫ N/(k+1): the heavy hitter must survive with a counter
    # within the MG error band (one compress per batch → ≤ 20·N_b/(k+1))
    assert "HEAVY" in state
    max_err = sum(200 // (MG_K + 1) + 1 for _ in range(20))
    assert state["HEAVY"] >= truth["HEAVY"] - max_err


def test_batch_mg_topk_over_crafted(spark):
    """Batch operator on a crafted two-shard corpus, checked by hand:
    shard compress then merge compress, deterministic ties."""
    from flink_cdc_multi_spark.plans.extensions import mg_topk_over

    rows = (
        [("s1", "a")] * 5 + [("s1", "b")] * 3 + [("s1", "c")] * 2
        + [("s1", "d")]
        + [("s2", "b")] * 4 + [("s2", "e")] * 2 + [("s2", "a")]
    )
    df = spark.createDataFrame(rows, "src string, tok string")
    got = [
        (r["rnk"], r["tok"], r["est_lb"])
        for r in mg_topk_over(df, "tok", "src", k=2).collect()
    ]
    # shard s1: counts a5 b3 c2 d1 → thr = 3rd largest = 2 → {a:3, b:1}
    # shard s2: counts b4 e2 a1 → thr = 3rd largest = 1 → {b:3, e:1}
    # merged: a3 b4 e1 → thr2 = 3rd largest = 1 → {b:3, a:2}
    assert got == [(1, "b", 3), (2, "a", 2)]


def test_batch_mg_lower_bound_vs_exact(spark):
    """ext_topk_freq's counters are lower bounds on exact corpus counts
    and the ranking is deterministic — checked on real testdata."""
    from flink_cdc_multi_spark.plans.extensions import ext_topk_freq
    from flink_cdc_multi_spark.plans.queries import load_table
    from pyspark.sql import functions as F

    from flink_cdc_multi_spark.operators.text import tokens

    sf = "/root/testdata/sf0.001"
    got = [(r["rnk"], r["token"], r["est_lb"])
           for r in ext_topk_freq(spark, sf).collect()]
    assert 0 < len(got) <= MG_K
    assert [r[0] for r in got] == list(range(1, len(got) + 1))
    docs = load_table(spark, sf, "documents")
    exact = {
        r["token"]: r["c"]
        for r in docs.filter(F.trim("text") != "")
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token").agg(F.count("*").alias("c")).collect()
    }
    for _, tok, lb in got:
        assert lb <= exact[tok], (tok, lb, exact[tok])

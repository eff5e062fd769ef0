"""Streaming MinHash signature (streaming/stateful.minhash_sig_stream):
exact merge equivalence — MIN is lossless-mergeable, so the streaming
signature after any batch split equals the batch min-fold over the union
of all values, bit-for-bit (the HLL pin pattern), across a checkpoint
restart too. The hash family is the batch kernel's xxhash64(lit(k), v)."""

import json

from pyspark.sql import functions as F

from flink_cdc_multi_spark.streaming.stateful import minhash_sig_stream

K = 8


def _feed_file(feed, name, rows):
    (feed / name).write_text("\n".join(json.dumps(r) for r in rows))


def _rows(g, values):
    return [{"g": g, "v": v} for v in values]


def _latest(emissions):
    out = {}
    for _b, rows in emissions:
        for r in rows:
            out[r["g"]] = list(r["sig"])
    return out


def _batch_sig(spark, feed):
    df = spark.read.schema("g string, v string").json(str(feed)).filter(
        "v is not null"
    )
    agg = df.groupBy("g").agg(
        *[F.min(F.xxhash64(F.lit(k), F.col("v"))).alias(f"h{k}")
          for k in range(K)]
    )
    return {
        r["g"]: [r[f"h{k}"] for k in range(K)] for r in agg.collect()
    }


def _run(spark, feed, ckpt):
    stream = (
        spark.readStream.schema("g string, v string")
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    out = minhash_sig_stream(stream, "g", "v", num_hashes=K)
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


def test_stream_equals_batch_signature_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    _feed_file(feed, "f1.jsonl",
               _rows("en", [f"w{i}" for i in range(25)])
               + _rows("fr", ["a", "b"]))
    _feed_file(feed, "f2.jsonl",
               _rows("en", [f"w{i}" for i in range(10, 40)])
               + _rows("fr", ["b", "c"])
               + [{"g": "fr", "v": None}])  # NULL is not a value
    got = _latest(_run(spark, feed, tmp_path / "ckpt"))
    assert got == _batch_sig(spark, feed)


def test_stream_state_survives_restart(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = tmp_path / "ckpt"
    _feed_file(feed, "f1.jsonl", _rows("en", [f"w{i}" for i in range(15)]))
    _run(spark, feed, ckpt)
    _feed_file(feed, "f2.jsonl", _rows("en", [f"w{i}" for i in range(5, 30)]))
    got = _latest(_run(spark, feed, ckpt))
    assert got == _batch_sig(spark, feed)


def test_signatures_estimate_jaccard(spark, tmp_path):
    """Semantic sanity: two heavily-overlapping streams agree on most
    signature slots; two disjoint streams agree on ~none (the MinHash
    property the signature exists for)."""
    feed = tmp_path / "feed"
    feed.mkdir()
    shared = [f"s{i}" for i in range(200)]
    _feed_file(feed, "f1.jsonl",
               _rows("a", shared + ["only_a"])
               + _rows("b", shared + ["only_b"])
               + _rows("c", [f"zzz{i}" for i in range(200)]))
    got = _latest(_run(spark, feed, tmp_path / "ckpt"))
    agree_ab = sum(x == y for x, y in zip(got["a"], got["b"]))
    agree_ac = sum(x == y for x, y in zip(got["a"], got["c"]))
    assert agree_ab >= K - 2   # J ≈ 200/202
    assert agree_ac <= 1       # J = 0

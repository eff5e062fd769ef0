"""Streaming outlier moments (streaming/stateful.outlier_moments_stream):
the (n, S, Q) state is sum-mergeable, so the running moments after any
batch split equal the batch aggregate over the union bit-for-bit (the
HLL pin class), across a checkpoint restart; per-batch outlier counts
follow the exact cross-multiplied 3σ contract."""

import json

from pyspark.sql import functions as F

from flink_cdc_multi_spark.streaming.stateful import outlier_moments_stream


def _feed_file(feed, name, rows):
    (feed / name).write_text("\n".join(json.dumps(r) for r in rows))


def _rows(g, values):
    return [{"g": g, "v": v} for v in values]


def _latest(emissions):
    out = {}
    for _b, rows in emissions:
        for r in rows:
            out[r["g"]] = (r["n"], r["s"], r["q"])
    return out


def _run(spark, feed, ckpt):
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    out = outlier_moments_stream(stream, "g", "v")
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


def _batch_moments(spark, feed):
    df = spark.read.schema("g string, v double").json(str(feed)).filter(
        "v is not null"
    )
    x = F.least(
        F.greatest(F.floor(F.col("v") + F.lit(0.5)), F.lit(-100000)),
        F.lit(100000),
    ).cast("bigint")
    agg = df.select("g", x.alias("x")).groupBy("g").agg(
        F.count("*").alias("n"), F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    return {r["g"]: (r["n"], r["s"], r["q"]) for r in agg.collect()}


def test_stream_moments_equal_batch_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    _feed_file(feed, "f1.jsonl",
               _rows("a", [10.0, 11.0, 12.0, 1e9])  # clamp rail in batch 1
               + _rows("b", [5.0, 5.0]))
    _feed_file(feed, "f2.jsonl",
               _rows("a", [10.4, 9.6])  # rounding: 10 each
               + _rows("b", [5.0])
               + [{"g": "b", "v": None}])  # NULL drops
    got = _latest(_run(spark, feed, tmp_path / "ckpt"))
    assert got == _batch_moments(spark, feed)


def test_stream_state_survives_restart(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = tmp_path / "ckpt"
    _feed_file(feed, "f1.jsonl", _rows("a", [1.0, 2.0, 3.0]))
    _run(spark, feed, ckpt)
    _feed_file(feed, "f2.jsonl", _rows("a", [4.0, 1000.0]))
    got = _latest(_run(spark, feed, ckpt))
    assert got == _batch_moments(spark, feed)


def test_batch_outlier_counts_follow_contract(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # batch 1: tight cluster -> no outliers; batch 2 adds a monster:
    # against the RUNNING moments it must flag (and only it)
    _feed_file(feed, "f1.jsonl", _rows("a", [10.0] * 20 + [11.0] * 20))
    _feed_file(feed, "f2.jsonl", _rows("a", [10.0, 5000.0]))
    ems = _run(spark, feed, tmp_path / "ckpt")
    per_batch = {}
    for _b, rows in ems:
        for r in rows:
            per_batch[r["n"]] = r["n_batch_outliers"]
    assert per_batch[40] == 0   # var>0 (10s and 11s) but no 3-sigma value
    assert per_batch[42] == 1   # the 5000, against running moments
    # all-equal prefix: if the first batch had zero variance it emits 0
    feed2 = tmp_path / "feed2"
    feed2.mkdir()
    _feed_file(feed2, "f1.jsonl", _rows("c", [7.0] * 10))
    ems2 = _run(spark, feed2, tmp_path / "ckpt2")
    assert all(r["n_batch_outliers"] == 0 for _b, rows in ems2 for r in rows)

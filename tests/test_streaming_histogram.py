"""Streaming fixed-grid quantile sketch (stateful.histogram_stream):
bucket counts merge by addition, so the stream after any batch split must
equal the BATCH query itself (ext_sketch_histogram) over the union of all
rows so far — same grid, same integer-ceil quantile rule, compared row for
row on the real query output."""

import json

from flink_cdc_multi_spark.plans.extensions import ext_sketch_histogram
from flink_cdc_multi_spark.streaming.stateful import histogram_stream


def _feed(feed, name, rows):
    (feed / name).write_text(
        "\n".join(
            json.dumps({"lang": lang, "text": "x" * n}) for lang, n in rows
        )
    )


def _batch(spark, feed, tmp_path):
    """Run the REAL batch query over the accumulated feed rows."""
    import pandas as pd

    df = spark.read.schema("lang string, text string").json(str(feed))
    pdf = df.toPandas()
    pdf["doc_id"] = range(len(pdf))
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    sf = tmp_path / "sf_batch"
    sf.mkdir(exist_ok=True)
    pd.DataFrame(pdf).to_parquet(sf / "documents.parquet")
    return {
        r["lang"]: (r["n_docs"], r["p50_lb"], r["p90_lb"], r["p99_lb"])
        for r in ext_sketch_histogram(spark, str(sf)).collect()
    }


def test_stream_equals_batch_histogram(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # lengths straddling bucket edges (15/16/17) and a long tail
    _feed(feed, "f1.jsonl",
          [("en", n) for n in (3, 15, 16, 17, 40, 41, 200)]
          + [("fr", 8), ("fr", 9)])
    _feed(feed, "f2.jsonl",
          [("en", n) for n in (16, 31, 32, 1000)] + [("fr", 300)])

    stream = (
        spark.readStream.schema("lang string, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    lengths = histogram_stream(
        stream.selectExpr("lang", "length(text) AS n"), "lang", "n"
    )
    emissions = []
    q = (
        lengths.writeStream.foreachBatch(
            lambda df, b: emissions.append((b, df.collect()))
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    last = {}
    for _b, rows in sorted(emissions):
        for r in rows:
            last[r["lang"]] = (
                r["n_docs"], r["p50_lb"], r["p90_lb"], r["p99_lb"]
            )
    assert last == _batch(spark, feed, tmp_path)
    # spot semantics: en has 11 docs; p50 = ceil(0.5*11)=6th smallest
    # (3,15,16,16,17,31,...) -> 31 div 16 = bucket 1 -> lb 16
    assert last["en"][0] == 11 and last["en"][1] == 16

    # restart resumes from checkpointed bucket counts: add a batch and
    # re-run against the SAME checkpoint — still equals the batch query
    _feed(feed, "f3.jsonl", [("en", 5000), ("fr", 1)])
    stream2 = (
        spark.readStream.schema("lang string, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    emissions2 = []
    q2 = (
        histogram_stream(
            stream2.selectExpr("lang", "length(text) AS n"), "lang", "n"
        )
        .writeStream.foreachBatch(
            lambda df, b: emissions2.append((b, df.collect()))
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    for _b, rows in sorted(emissions2):
        for r in rows:
            last[r["lang"]] = (
                r["n_docs"], r["p50_lb"], r["p90_lb"], r["p99_lb"]
            )
    assert last == _batch(spark, feed, tmp_path)

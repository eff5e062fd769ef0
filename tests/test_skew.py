"""Salted-join skew mitigation: result equivalence + physical spread."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_multi_spark.operators.skew import salt_probe, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 5k rows of one hot key + a uniform tail; small build side per key
    probe = spark.range(6000).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(F.col("id") % 40).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(40).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    return probe, build


def test_salted_join_matches_plain_inner_and_left(skewed, spark):
    probe, build = skewed
    for how in ("inner", "left"):
        plain = probe.join(build, ["k"], how)
        salted = salted_join(probe, build, ["k"], n_salts=8, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def test_salted_join_left_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, "x"), (99, "y")], "k long, payload string")
    build = spark.createDataFrame([(1, "d")], "k long, name string")
    got = sorted(map(tuple, salted_join(probe, build, ["k"], 4, "left").collect()))
    assert got == [(1, "x", "d"), (99, "y", None)]


def test_salt_spreads_hot_key_and_is_deterministic(skewed):
    probe, _ = skewed
    salted = salt_probe(probe, 8)
    hot = salted.filter(F.col("k") == 7).groupBy("__salt").count().collect()
    # the hot key must occupy ALL salt buckets, reasonably evenly
    assert len(hot) == 8
    assert max(r["count"] for r in hot) < 3 * min(r["count"] for r in hot)
    # row-stable: re-evaluation yields identical salts (task-retry safety)
    a = {r["payload"]: r["__salt"] for r in salted.collect()}
    b = {r["payload"]: r["__salt"] for r in salt_probe(probe, 8).collect()}
    assert a == b


def test_salted_join_rejects_unsupported_how(skewed):
    probe, build = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(probe, build, ["k"], 8, "right")

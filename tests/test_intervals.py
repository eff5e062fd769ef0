"""operators/intervals.interval_join (r17): the binned range-join API
promoted from ext_events_interval_join. Pins: exact inclusive
containment with each pair appearing EXACTLY once (including probes and
intervals straddling bucket boundaries), NULL/inverted-interval drops,
negative (pre-epoch) coordinates, and both overflow modes of the
fan-out bound, incl. the hostile long-interval row the verdict asked
for."""

import pytest
from pyspark.sql import functions as F

from flink_cdc_multi_spark.operators.intervals import interval_join


def _frames(spark):
    ivl = spark.createDataFrame(
        [
            ("a", 0, 100),        # within one bucket (width 1000)
            ("b", 900, 2100),     # spans 3 buckets
            ("c", 2100, 2100),    # degenerate point interval
            ("d", None, 500),     # NULL start: drops
            ("e", 500, None),     # NULL end: drops
            ("f", 700, 600),      # inverted: drops
            ("g", -2500, -1500),  # pre-epoch
        ],
        "iv string, s long, e long",
    )
    pr = spark.createDataFrame(
        [
            ("p0", 0), ("p1", 100), ("p2", 101), ("p3", 999),
            ("p4", 1000), ("p5", 2100), ("p6", 2101),
            ("p7", -2000), ("p8", None),
        ],
        "pv string, p long",
    )
    return ivl, pr


def test_exact_containment_each_pair_once(spark):
    ivl, pr = _frames(spark)
    got = sorted(
        (r["iv"], r["pv"])
        for r in interval_join(ivl, pr, "s", "e", "p", 1000).collect()
    )
    # hand-checked truth: inclusive both ends; d/e/f never match; p8 never
    want = sorted([
        ("a", "p0"), ("a", "p1"),            # 0 and 100 in [0, 100]
        ("b", "p3"), ("b", "p4"), ("b", "p5"),  # 999/1000/2100 in [900,2100]
        ("c", "p5"),                          # 2100 in [2100, 2100]
        ("g", "p7"),                          # -2000 in [-2500, -1500]
    ])
    assert got == want
    # exactly once: no pair duplicated even when the interval spans the
    # probe's bucket boundary
    assert len(got) == len(set(got))


def test_matches_naive_join_on_random_data(spark):
    """Property pin vs the semantic definition (a plain non-equi join)
    on random data — the formulation-independence oracle pattern."""
    import random

    random.seed(11)
    ivl_rows = []
    for i in range(60):
        s = random.randrange(-5000, 5000)
        ivl_rows.append((i, s, s + random.randrange(0, 4000)))
    pr_rows = [(j, random.randrange(-6000, 7000)) for j in range(300)]
    ivl = spark.createDataFrame(ivl_rows, "iv long, s long, e long")
    pr = spark.createDataFrame(pr_rows, "pv long, p long")
    got = sorted(
        (r["iv"], r["pv"])
        for r in interval_join(ivl, pr, "s", "e", "p", 700).collect()
    )
    want = sorted(
        (iv, pv)
        for iv, s, e in ivl_rows
        for pv, p in pr_rows
        if s <= p <= e
    )
    assert got == want


def test_overflow_error_mode_kills_the_monster_interval(spark):
    ivl = spark.createDataFrame(
        [("ok", 0, 500), ("monster", 0, 10_000_000)], "iv string, s long, e long"
    )
    pr = spark.createDataFrame([("p", 100)], "pv string, p long")
    out = interval_join(
        ivl, pr, "s", "e", "p", 1000, max_buckets_per_interval=100
    )
    with pytest.raises(Exception, match="interval_join"):
        out.collect()


def test_overflow_drop_mode_keeps_the_pipeline_alive(spark):
    ivl = spark.createDataFrame(
        [("ok", 0, 500), ("monster", 0, 10_000_000)], "iv string, s long, e long"
    )
    pr = spark.createDataFrame(
        [("p", 100), ("q", 5_000_000)], "pv string, p long"
    )
    got = sorted(
        (r["iv"], r["pv"])
        for r in interval_join(
            ivl, pr, "s", "e", "p", 1000,
            max_buckets_per_interval=100, on_overflow="drop",
        ).collect()
    )
    # the monster interval (and ONLY it) is gone; q matched only it
    assert got == [("ok", "p")]


def test_rejects_overlapping_column_names_and_bad_args(spark):
    ivl = spark.createDataFrame([(1, 2, 3)], "x long, s long, e long")
    pr = spark.createDataFrame([(1, 5)], "x long, p long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(ivl, pr, "s", "e", "p", 1000)
    pr2 = spark.createDataFrame([(1, 5)], "y long, p long")
    with pytest.raises(ValueError, match="positive"):
        interval_join(ivl, pr2, "s", "e", "p", 0)
    with pytest.raises(ValueError, match="on_overflow"):
        interval_join(ivl, pr2, "s", "e", "p", 1000,
                      max_buckets_per_interval=5, on_overflow="explode")


def test_no_nested_loop_join_in_plan(spark):
    """The whole point: the plan must be an equi join on the bucket id,
    never BroadcastNestedLoopJoin (the gate query's pin, re-pinned at
    the API level)."""
    import io
    from contextlib import redirect_stdout

    ivl = spark.createDataFrame([(1, 0, 100)], "iv long, s long, e long")
    pr = spark.createDataFrame([(1, 50)], "pv long, p long")
    out = interval_join(ivl, pr, "s", "e", "p", 1000)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 1


def test_gate_query_rides_the_api(spark):
    """ext_events_interval_join must produce identical results through
    the promoted API (regression vs the r16 inline form's contract is
    the oracle gate; here: ANY result at all + schema)."""
    from flink_cdc_multi_spark.plans.extensions import (
        ext_events_interval_join,
    )

    df = ext_events_interval_join(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "session_no", "n_events", "n_concurrent"]
    # self-containment: every session contains its own events
    for r in rows:
        assert r["n_concurrent"] >= r["n_events"]

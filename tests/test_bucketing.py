"""Bucketed layout (operators/bucketing.py): the written bucket metadata
must actually eliminate Exchanges for same-key aggregation and co-bucketed
joins — the property the module exists for."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from flink_cdc_multi_spark.operators.bucketing import read_bucketed, write_bucketed
from flink_cdc_multi_spark.plans.queries import load_table

SF = "/root/testdata/sf0.001"


def _plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_events(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    write_bucketed(
        ev, "ev_bucketed", ["user_id"], num_buckets=8, path=str(base / "ev")
    )
    write_bucketed(
        ev.groupBy("user_id").agg(F.count("*").alias("n")),
        "ev_counts_bucketed",
        ["user_id"],
        num_buckets=8,
        path=str(base / "cnt"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS ev_counts_bucketed")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_events):
    agg = read_bucketed(spark, "ev_bucketed").groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("event_id").alias("mx")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan
    # and the result matches the unbucketed computation
    want = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {r["user_id"]: r["n"] for r in agg.collect()}
    assert got == want


def test_cobucketed_join_has_no_exchange(spark, bucketed_events):
    a = read_bucketed(spark, "ev_bucketed")
    b = read_bucketed(spark, "ev_counts_bucketed")
    # disable auto-broadcast so the join planner must rely on co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id").select("user_id", "event_id", "n")
        plan = _plan(joined)
        assert "Exchange" not in plan
        assert joined.count() == a.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_direct_parquet_read_loses_bucketing(spark, bucketed_events, tmp_path):
    """Document the sharp edge: reading the same files WITHOUT the catalog
    re-introduces the Exchange."""
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ev_bucketed")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    raw = spark.read.parquet(loc)
    plan = _plan(raw.groupBy("user_id").agg(F.count("*").alias("n")))
    assert "Exchange" in plan


def test_register_bucketed_restores_layout(spark, bucketed_events):
    """register_bucketed re-attaches an existing bucketed dir (the
    new-session / other-machine path: the in-memory catalog is
    session-scoped, the FILES are not) and the planner gets the
    co-location back: no Exchange under a groupBy on the bucket key,
    and values match the original table."""
    from flink_cdc_multi_spark.operators.bucketing import register_bucketed

    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ev_bucketed")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    want = {r["user_id"]: r["n"] for r in
            read_bucketed(spark, "ev_bucketed").groupBy("user_id")
            .agg(F.count("*").alias("n")).collect()}
    try:
        re = register_bucketed(spark, "ev_reattached", loc, ["user_id"], 8)
        agg = re.groupBy("user_id").agg(F.count("*").alias("n"))
        assert "Exchange" not in _plan(agg)
        assert {r["user_id"]: r["n"] for r in agg.collect()} == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_reattached")


def test_is_bucketed_on_detection(spark, bucketed_events):
    """is_bucketed_on sees the bucket spec through projections and
    filters, and stops claiming it past a join/aggregate or on a raw
    parquet read (where the layout is physically present but invisible
    to the planner — claiming it would mis-order joins for no win)."""
    from flink_cdc_multi_spark.operators.bucketing import (
        bucket_layout,
        is_bucketed_on,
    )

    b = read_bucketed(spark, "ev_bucketed")
    assert bucket_layout(b) == (["user_id"], 8)
    assert is_bucketed_on(b, "user_id")
    assert is_bucketed_on(
        b.filter("value > 0").select("user_id", "event_id"), "user_id"
    )
    assert not is_bucketed_on(b, "event_id")
    # past an aggregate the frame is no longer a scan of the layout
    assert not is_bucketed_on(
        b.groupBy("user_id").agg(F.count("*").alias("n")), "user_id"
    )
    # raw parquet read of the same files: planner-invisible layout
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ev_bucketed")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    assert not is_bucketed_on(spark.read.parquet(loc), "user_id")


@pytest.fixture(scope="module")
def bucketed_lineitem(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("li_buckets")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(
        li.repartition(8, "l_orderkey"),
        "li_bucketed",
        ["l_orderkey"],
        num_buckets=8,
        path=str(base / "li"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")


def test_q27_plan_is_partitioning_aware(spark, bucketed_lineitem):
    """VERDICT r10 item 1: on l_orderkey-bucketed lineitem, q27_plan puts
    the bucket-key (orderkey) join FIRST so lineitem never shuffles — the
    shipped suppkey-first order destroys the bucket partitioning and
    measured WORSE than unbucketed at sf10 (4.96 s vs 3.66 s; reordered
    2.66 s, PERF.md r10). Pin: no l_orderkey Exchange anywhere in the
    bucketed plan (if the suppkey join ran first, the orderkey join
    would have to re-shuffle its output on l_orderkey), while the
    unbucketed plan keeps one. Results identical across layouts."""
    from flink_cdc_multi_spark.plans.queries import q27_plan

    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    supplier = load_table(spark, SF, "supplier")
    nation = load_table(spark, SF, "nation")
    li_fixture = load_table(spark, SF, "lineitem")
    li_b = read_bucketed(spark, "li_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = q27_plan(li_b, orders, customer, supplier, nation)
        shipped = q27_plan(li_fixture, orders, customer, supplier, nation)
        plan_b, plan_s = _plan(bucketed), _plan(shipped)
        # formatted explain prints the Exchange node and its
        # "Arguments: hashpartitioning(...)" on separate lines
        assert "hashpartitioning(l_orderkey" not in plan_b
        assert "hashpartitioning(l_orderkey" in plan_s
        key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
        assert key(bucketed.collect()) == key(shipped.collect())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_shuffle_hash_join_no_exchange_no_sort(spark, bucketed_events):
    """The sf10 q28 recipe (PERF.md r10): on co-bucketed tables a
    shuffle_hash hint on the smaller side upgrades the zero-exchange
    sort-merge join to a zero-exchange ZERO-SORT hash join — bucketed
    scans satisfy the hash-partitioning requirement directly, and the
    hash build replaces both per-bucket sorts (sf10: SMJ 1.86 s → SHJ
    1.25 s, 1.45x DuckDB, under the 2x bar)."""
    a = read_bucketed(spark, "ev_bucketed")
    b = read_bucketed(spark, "ev_counts_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b.hint("shuffle_hash"), "user_id").select(
            "user_id", "event_id", "n"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan
        assert "Sort" not in plan
        assert "ShuffledHashJoin" in plan
        assert joined.count() == a.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

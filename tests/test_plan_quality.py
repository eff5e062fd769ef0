"""Plan-quality regression tests: the physical-plan properties PERF.md
documents must survive future edits (pushdown reaching the scan, broadcast
joins on dims, TakeOrderedAndProject for top-k, partial aggregation)."""

import io
from contextlib import redirect_stdout

import pytest

from flink_cdc_multi_spark.plans import ALL_QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    df = ALL_QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01")
    assert "PushedFilters:" in plan
    assert "Not(EqualTo(event_type,delete))" in plan
    # props column never read (pruned scan)
    assert "props" not in plan


def test_q09_broadcast_join_no_sortmerge(spark):
    plan = plan_of(spark, "q09")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q10_preagg_before_join(spark):
    plan = plan_of(spark, "q10")
    # partial aggregation on o_custkey must appear below the join
    assert plan.count("HashAggregate") >= 4
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q12_take_ordered_no_global_sort(spark):
    plan = plan_of(spark, "q12")
    assert "TakeOrderedAndProject" in plan


def test_q14_shipdate_pushdown(spark):
    plan = plan_of(spark, "q14")
    assert "LessThanOrEqual(l_shipdate" in plan
    # only the 6 needed columns are read
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q16_lang_pushdown(spark):
    plan = plan_of(spark, "q16")
    assert "EqualTo(lang,en)" in plan


def test_ext_tokens_partial_aggregation(spark):
    plan = plan_of(spark, "ext_text_tokens_by_lang")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_ext_dedup_exact_is_windowed_not_sorted_globally(spark):
    plan = plan_of(spark, "ext_dedup_exact")
    assert "Window" in plan  # row_number per digest partition

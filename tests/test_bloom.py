"""ext_sketch_bloom (r17): the Bloom membership sketch. Pins: the
one-sided guarantee (NO false negatives — every probe token present in a
lang's corpus hits its filter), a false-positive sanity band at the
gate geometry, NULL-lang row survival, and the mergeable plan shape
(partial bit_or before one exchange, no Expand)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_cdc_multi_spark.operators.sketch import (
    BLOOM_K,
    BLOOM_M,
)
from flink_cdc_multi_spark.plans.extensions import (
    EXT_ORACLE_SQL,
    ext_sketch_bloom,
)


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet")


def test_no_false_negatives_and_cross_engine(spark, tmp_path):
    """Every token of doc 0 (the probe doc) is IN the 'en' corpus, so the
    en filter must report ALL probes as members; and Spark == DuckDB on
    the whole output."""
    probe_text = " ".join(f"shared{i}" for i in range(30))
    # probe set = distinct tokens of doc_id < 5 → the 30 shared tokens,
    # extra_en_token, and the 4 french words: 35 probes total
    rows = [
        (0, probe_text, "en", "s", len(probe_text)),
        (1, probe_text + " extra_en_token", "en", "s", 10),
        (2, "completely different french words", "fr", "s", 10),
    ]
    _write_docs(tmp_path, rows)
    got = {
        r["lang"]: (r["n_bits_set"], r["n_probe_hits"], r["n_probes"])
        for r in ext_sketch_bloom(spark, str(tmp_path)).collect()
    }
    assert got["en"][2] == got["fr"][2] == 35
    # no false negatives: every probe that IS in a lang's corpus hits
    # its filter (en holds 31 of the probes, fr holds 4); at this
    # geometry (2^18 bits, ≤ 124/16 set) a false positive from the
    # foreign probes is ~impossible, so the counts are exact
    assert got["en"][1] == 31
    assert got["fr"][1] == 4
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle = {
        lang: (nb, nh, np)
        for lang, nb, nh, np in con.execute(
            EXT_ORACLE_SQL["ext_sketch_bloom"]
        ).fetchall()
    }
    assert oracle == got


def test_bits_set_bounded_by_insertions(spark, tmp_path):
    """n_bits_set ≤ K · distinct tokens (each insert sets ≤ K bits) and
    > 0 for a non-empty corpus — the geometry sanity bound."""
    text = " ".join(f"tok{i}" for i in range(500))
    _write_docs(tmp_path, [(0, text, "en", "s", len(text))])
    row = ext_sketch_bloom(spark, str(tmp_path)).collect()
    # the probe doc is doc 0 itself here; membership must be total
    assert row[0]["n_probe_hits"] == row[0]["n_probes"] == 500
    assert 0 < row[0]["n_bits_set"] <= BLOOM_K * 500
    assert row[0]["n_bits_set"] <= BLOOM_M


def test_null_lang_keeps_its_filter_row(spark, tmp_path):
    rows = [
        (0, "probe tokens here", "en", "s", 10),
        (7, "null lang corpus tokens", None, "s", 10),
    ]
    _write_docs(tmp_path, rows)
    got = {
        r["lang"]: r["n_bits_set"]
        for r in ext_sketch_bloom(spark, str(tmp_path)).collect()
    }
    assert None in got and got[None] > 0


@pytest.mark.parametrize("node", ["Expand"])
def test_plan_has_partial_bitor_no_blowup(spark, node):
    """The mergeable-sketch shape: map-side partial bit_or collapse, no
    Expand fan-out; the probe-sketch join is a broadcast HASH join. One
    BroadcastNestedLoopJoin is allowed — the 1-row n_probes scalar
    crossJoin (constant-size, not a corpus join)."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(0, "a b c", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import flink_cdc_multi_spark.plans.queries as Q

    orig = Q.load_table
    try:
        Q.load_table = lambda _s, _d, _t: df
        import flink_cdc_multi_spark.plans.extensions as E

        orig2 = E.load_table
        E.load_table = Q.load_table
        try:
            plan_df = ext_sketch_bloom(spark, "ignored")
        finally:
            E.load_table = orig2
    finally:
        Q.load_table = orig
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert node not in plan
    assert "partial_bit_or" in plan or "bit_or" in plan
    assert "BroadcastHashJoin" in plan
    # formatted explain prints each node twice (tree + detail section):
    # ≤ 2 occurrences = exactly the one scalar cross join node
    assert plan.count("BroadcastNestedLoopJoin") <= 2

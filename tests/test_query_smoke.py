"""Plan-construction smoke test over the FULL declared query surface
against the REAL driver testdata.

Round-4 lesson: 245 green tests coexisted with a driver-gate query that
threw AnalysisException at plan time, because no test built ALL_QUERIES
against /root/testdata (the driver regenerated events.ts with a different
physical parquet type and only the gate saw it). This closes that blind
spot: build every declared plan at sf0.001 and touch `.schema` — plan
construction + analysis only, no execution, seconds of runtime.
"""

import os

import pytest

from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL, ALL_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason=f"driver testdata not present at {SF_DIR}",
)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_plan_builds_on_real_testdata(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    # .schema forces full analysis (resolution + type-checking) without
    # running a job; this is exactly where ext_sessionize failed in r4.
    # (Two index-building queries are the deliberate exception and DO
    # execute during construction: ext_ann_ivf collects its centroids,
    # ext_dedup_clusters runs its iterative fixpoint — at sf0.001 both
    # are sub-second.)
    assert len(df.schema.fields) > 0


def test_events_ts_is_canonical_timestamp(spark):
    """Every query must see events.ts as TIMESTAMP (LTZ) regardless of how
    the fixture was physically written (nanos-as-long, NTZ, or LTZ)."""
    from flink_cdc_multi_spark.plans.queries import load_table

    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_oracle_sql_keys_subset_of_queries():
    """Every oracle entry must correspond to a declared query."""
    assert set(ALL_ORACLE_SQL) <= set(ALL_QUERIES)


def test_driver_gate_window_rotates_to_stale_queries():
    """The driver gates the first 50 of ALL_QUERIES. Pin the rotation
    contract (VERDICT r7 item 1, refined r9): every registered query
    without a PASSING row in the most recent committed
    CORRECTNESS_r*.json must sit inside the 50-window, so it regains a
    fresh driver-green row this round. Failed rows don't count as
    checked (ADVICE r8): a red query must stay in the window until
    green, not rotate to the back because the driver 'looked at it'."""
    import json
    import re
    from pathlib import Path

    from flink_cdc_multi_spark.plans import _row_passed

    repo_root = Path(__file__).resolve().parents[1]
    files = sorted(
        repo_root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not files:
        pytest.skip("no CORRECTNESS history committed")
    latest = {
        name
        for name, row in json.loads(files[-1].read_text()).items()
        if _row_passed(row)
    }
    from flink_cdc_multi_spark.plans import _ACTIVE_REGATE

    window = set(list(ALL_QUERIES)[:50])
    stale = set(ALL_QUERIES) - latest
    overflow = stale - window
    # ACTIVE pins (this round's plan changes) legitimately take window slots
    # ahead of stale-but-unchanged queries; overflow is only a bug when the
    # required set (stale + active pins) actually fits in 50.
    required = stale | set(_ACTIVE_REGATE)
    assert len(required) > 50 or not overflow, (
        f"stale queries pushed outside the driver gate window: {sorted(overflow)}"
    )
    # And even when it can't fit, the spill must be exactly the shortfall —
    # never more than the pins displaced.
    assert len(overflow) <= max(0, len(required) - 50), (
        f"window wasted slots: {len(overflow)} stale spilled with only "
        f"{len(required)} required for 50 slots: {sorted(overflow)}"
    )


def test_driver_gate_window_is_least_recently_checked(  # VERDICT r9 item 6
):
    """History-wide rotation contract: no query INSIDE the 50-window may
    have a more recent passing driver row than any query OUTSIDE it
    (modulo explicit _REGATE pins). This is the property that makes the
    rotation self-maintaining — each round the window is exactly the
    least-recently-checked 50 of the committed CORRECTNESS history."""
    from flink_cdc_multi_spark.plans import _ACTIVE_REGATE, _last_checked_rounds

    checked = _last_checked_rounds()
    names = list(ALL_QUERIES)
    window, outside = names[:50], names[50:]
    if not outside:
        pytest.skip("registry fits inside one driver window")
    newest_in = max(
        (checked.get(q, -1) for q in window if q not in _ACTIVE_REGATE), default=-1
    )
    oldest_out = min(checked.get(q, -1) for q in outside)
    assert newest_in <= oldest_out, (
        f"window holds a fresher query (r{newest_in}) than one it "
        f"excludes (r{oldest_out}) — rotation is not least-recently-checked"
    )


def test_fixture_contract(spark):
    """Invariants the static oracle SQL depends on — if the driver
    regenerates testdata with different shapes, fail HERE with a clear
    message instead of deep inside the correctness gate (the r4 lesson:
    events.ts silently changed physical type and cost the round its
    bench). Each assertion names the queries it protects."""
    from flink_cdc_multi_spark.plans.queries import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    assert dict(emb.dtypes)["vec_id"] == "bigint"
    # LSH/IVF oracles hardcode range(64) over components
    dim = len(emb.select("embedding").first()["embedding"])
    assert dim == 64, f"embeddings dim {dim} != 64: ext_ann_*/ext_dedup_embedding* oracle SQL needs updating"

    docs = load_table(spark, SF_DIR, "documents")
    doc_types = dict(docs.dtypes)
    assert doc_types.get("doc_id") == "bigint" and doc_types.get("text") == "string"
    assert doc_types.get("lang") == "string", "q16/ext_text_* filter on documents.lang"

    ev = load_table(spark, SF_DIR, "events")
    ev_types = dict(ev.dtypes)
    assert ev_types.get("ts") == "timestamp"  # canonical after load_table
    for c, t in (("event_id", "bigint"), ("user_id", "bigint"),
                 ("event_type", "string"), ("value", "double")):
        assert ev_types.get(c) == t, f"events.{c} is {ev_types.get(c)}, expected {t}"

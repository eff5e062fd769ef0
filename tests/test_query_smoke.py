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

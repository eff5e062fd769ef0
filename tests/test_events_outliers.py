"""ext_events_outliers (r17): the cross-multiplied exact 3σ contract on
crafted values — a known outlier flips the test, all-equal groups (var=0)
emit nothing, the hostile 1e9 value lands on the clamp rail, NULL values
drop, NULL event_type stays one group — cross-checked vs DuckDB."""

import duckdb
import pandas as pd

from flink_cdc_multi_spark.plans.extensions import (
    EXT_ORACLE_SQL,
    ext_events_outliers,
)


def test_crafted_outliers_cross_engine(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # group 'click': 50 values of ~10 plus one 1000 -> the 1000 is >3σ
    for i in range(50):
        rows.append((i, 1, t0, "click", 10.0 + (i % 3)))
    rows.append((50, 1, t0, "click", 1000.0))
    # group 'view': all equal -> var=0 -> no outliers by contract
    for i in range(60, 70):
        rows.append((i, 2, t0, "view", 7.0))
    # group NULL type: crafted outlier must still be found (one group)
    for i in range(80, 90):
        rows.append((i, 3, t0, None, 5.0))
    rows.append((90, 3, t0, None, 500.0))
    # hostile magnitude: clamps to 1e5, not an overflow
    rows.append((91, 4, t0, "click", 1e9))
    # NULL value: dropped
    rows.append((92, 4, t0, "click", None))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    pdf["props"] = None
    pdf.to_parquet(tmp_path / "events.parquet")

    got = {
        r["event_type"]: (r["n"], r["n_outliers"])
        for r in ext_events_outliers(spark, str(tmp_path)).collect()
    }
    # click: 52 observations (incl. clamped 1e9). The clamp-rail 1e5
    # dominates the variance (σ ≈ 13.6k), so ONLY it exceeds 3σ — the
    # 1000 sits inside; exactly one outlier, and the hostile magnitude
    # flagged instead of overflowing is the point
    assert got["click"] == (52, 1)
    assert got["view"] == (10, 0)  # var=0 contract
    assert got[None][0] == 11 and got[None][1] >= 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = {
        et: (n, o)
        for et, n, o in con.execute(
            EXT_ORACLE_SQL["ext_events_outliers"]
        ).fetchall()
    }
    assert oracle == got

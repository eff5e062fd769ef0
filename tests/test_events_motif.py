"""ext_events_motif (r17): sequence-motif semantics on crafted events —
deterministic ordering (ties broken by event_id), NULL-ts exclusion,
NULL user_id as one group, unknown/NULL types as 'X', non-overlapping
counting — cross-checked against the DuckDB oracle."""

import duckdb
import pandas as pd

from flink_cdc_multi_spark.plans.extensions import (
    EXT_ORACLE_SQL,
    ext_events_motif,
)


def test_crafted_motifs_cross_engine(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: V C V C P  -> VC x2 (non-overlap), VCP x1
        (1, 1, t0, "view"), (2, 1, t0 + pd.Timedelta(seconds=1), "click"),
        (3, 1, t0 + pd.Timedelta(seconds=2), "view"),
        (4, 1, t0 + pd.Timedelta(seconds=3), "click"),
        (5, 1, t0 + pd.Timedelta(seconds=4), "purchase"),
        # user 2: E E E -> EE x1 (non-overlapping!), plus S V
        (6, 2, t0, "error"), (7, 2, t0 + pd.Timedelta(seconds=1), "error"),
        (8, 2, t0 + pd.Timedelta(seconds=2), "error"),
        (9, 2, t0 + pd.Timedelta(seconds=3), "signup"),
        (10, 2, t0 + pd.Timedelta(seconds=4), "view"),
        # user 3: tie timestamps -> event_id breaks: S(11) V(12) => SV
        (12, 3, t0, "view"), (11, 3, t0, "signup"),
        # NULL user: one group; weird type renders X
        (13, None, t0, "view"), (14, None, t0 + pd.Timedelta(seconds=1), "click"),
        (15, None, t0 + pd.Timedelta(seconds=2), "weird"),
        # NULL ts: excluded entirely
        (16, 1, None, "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    pdf["value"] = 1.0
    pdf["props"] = None
    pdf.to_parquet(tmp_path / "events.parquet")

    got = {
        r["motif"]: (r["n_users"], r["n_hits"])
        for r in ext_events_motif(spark, str(tmp_path)).collect()
    }
    # VC: user1 (2 hits), NULL-user (1 hit)  -> 2 users, 3 hits
    assert got["VC"] == (2, 3)
    assert got["VCP"] == (1, 1)
    # EEE counts ONE non-overlapping EE
    assert got["EE"] == (1, 1)
    # SV: user2 and the tie-ordered user3
    assert got["SV"] == (2, 2)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = {
        m: (u, h)
        for m, u, h in con.execute(
            EXT_ORACLE_SQL["ext_events_motif"]
        ).fetchall()
    }
    assert oracle == got

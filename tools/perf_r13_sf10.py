"""r13 sf10 measurement (run: python tools/perf_r13_sf10.py [sf_dir]):

ext_dedup_spans Spark vs DuckDB, SAME-SESSION interleaved ABAB (the
PERF.md A/B methodology — never separate JVMs). At sf10 the documents
input exceeds the broadcast guard, so this measures the SCALE path:
window-frequency build + large-large join on the 8-byte hash, the shape
a 100 TB corpus takes. Numbers go to PERF.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_multi_spark.plans import ALL_ORACLE_SQL  # noqa: E402
from flink_cdc_multi_spark.plans.extensions import ext_dedup_spans  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark(
        "perf-r13", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES.split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    plan = ext_dedup_spans(spark, sf_dir)
    sql = ALL_ORACLE_SQL["ext_dedup_spans"]
    # warm both engines once
    plan.write.format("noop").mode("overwrite").save()
    con.execute(sql).fetchall()
    sp, dk = [], []
    for _ in range(2):  # ABAB
        t0 = time.perf_counter()
        plan.write.format("noop").mode("overwrite").save()
        sp.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dk.append(round(time.perf_counter() - t0, 3))
    exec_plan = plan._jdf.queryExecution().executedPlan().toString()
    print(json.dumps({
        "spans_spark": min(sp), "spans_spark_waves": sp,
        "spans_duckdb": min(dk), "spans_duckdb_passes": dk,
        "ratio": round(min(sp) / min(dk), 3),
        "broadcast_taken": "BroadcastHashJoin" in exec_plan,
    }))


if __name__ == "__main__":
    main()

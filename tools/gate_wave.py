"""One prepared-plans concurrent gate wave at an explicit core count.

Child process of bench.py's scaling_sf1 row (r18, VERDICT r17 item 5):
local-mode task slots are fixed at session creation, so a second core
count needs a second process — this one honors the same
``$SPARK_GRAFT_CPUS`` mechanism as every other entry point (session.py)
and runs bench's own prepare/warm/min-of-N wave logic, so the two core
counts are measured by identical code.

Usage:  SPARK_GRAFT_CPUS=8 python tools/gate_wave.py <sf_dir>
Prints one JSON line: {"cores": N, "gate_wave_sec": best}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "gate_wave", extra_conf={"spark.sql.files.maxPartitionBytes": "16m"}
    )
    run = bench.prepare_gate_run(spark, sf_dir)
    best = bench.gate_concurrent_best(run, runs=2)
    print(json.dumps({"cores": cpus, "gate_wave_sec": best}))


if __name__ == "__main__":
    main()

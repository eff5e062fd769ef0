"""Honest DuckDB baseline for the q01-q14 suite at a given SF dir.

    python tools/bench_duckdb.py [/root/testdata/sf0.1]

Views over parquet (the driver's own setup), warm run first, then min-of-3
per query, sequential total + per-query. This is the bar bench.py's suite
wall-clock is judged against (VERDICT r01: 2x gate).
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry  # noqa: E402

SUITE = [f"q{i:02d}" for i in range(1, 15)]


def main(sf_dir: str) -> None:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = entry.oracle_sql()
    per = {}
    for q in SUITE:
        con.execute(oracle[q]).fetchall()  # warm
        best = min(
            (lambda t0: (con.execute(oracle[q]).fetchall(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        per[q] = round(best, 4)
    print(json.dumps({"sf_dir": sf_dir, "total_sec": round(sum(per.values()), 4), "queries": per}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

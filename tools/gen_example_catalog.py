"""Generate the local artifacts the example-configs/deploy configs point
at, so each deployment config validates in-container with

    python tools/gen_example_catalog.py
    python -m flink_cdc_multi_spark -c example-configs/deploy/<cfg>.json --validate

In a real deployment these artifacts don't exist: the registry comes from
live JDBC introspection (source.hostname) for mysql/postgres/oracle and
from live document sampling for mongodb. The parquet written here is
information_schema-shaped (table_schema / table_name / column_name /
type_name / ordinal_position) — exactly what `DataFrameCatalogReader`
reads and what a `SELECT * FROM information_schema.columns` export gives
you when the engine host cannot reach the database directly.
"""

from __future__ import annotations

import json
import os

import pandas as pd

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "example-configs", "deploy", "_artifacts")


def catalog_rows(source: str) -> list[tuple]:
    int_t, str_t, ts_t = {
        "mysql": ("INT", "VARCHAR", "DATETIME"),
        "postgres": ("int4", "varchar", "timestamp"),
        "oracle": ("NUMBER", "VARCHAR2", "TIMESTAMP(6)"),
    }[source]
    db = {"mysql": "shop", "postgres": "public", "oracle": "SHOP"}[source]
    rows = []
    for tbl, cols in (
        ("users", [("id", int_t), ("name", str_t), ("created_at", ts_t)]),
        ("orders", [("order_id", int_t), ("user_id", int_t), ("status", str_t)]),
    ):
        tbl = tbl.upper() if source == "oracle" else tbl
        for i, (c, t) in enumerate(cols, 1):
            c = c.upper() if source == "oracle" else c
            rows.append((db, tbl, c, t, i))
    return rows


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for source in ("mysql", "postgres", "oracle"):
        pd.DataFrame(
            catalog_rows(source),
            columns=["table_schema", "table_name", "column_name",
                     "type_name", "ordinal_position"],
        ).to_parquet(os.path.join(OUT, f"{source}-catalog.parquet"))
    with open(os.path.join(OUT, "mongodb-samples.json"), "w") as f:
        json.dump(
            {
                "appdb.users": [
                    {"_id": {"$oid": "65f000000000000000000001"},
                     "name": "a", "age": 30},
                    {"_id": {"$oid": "65f000000000000000000002"},
                     "name": "b", "age": 41},
                ]
            },
            f,
            indent=1,
        )
    print(f"wrote deploy artifacts under {OUT}")


if __name__ == "__main__":
    main()

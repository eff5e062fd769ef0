"""Scale the driver's sf0.1 testdata to a larger SF by disjoint replication.

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10

Each fact-table replica i shifts every key in its domain by
``i * (max_key + 1)``, with foreign keys shifted by the SAME per-domain
stride — so replica i of lineitem joins replica i of orders/part/supplier.
Join selectivity, per-key cardinality, and value distributions are exactly
those of the source; only the number of key groups grows. Dimension tables
``region``/``nation`` stay fixed (TPC-H semantics). PyArrow is used (not
DuckDB) so parquet physical types round-trip exactly — ``events.ts`` is
TIMESTAMP(NANOS) and must stay NANOS for the engine's nanosAsLong contract.

This is a bench-data tool (PERF.md sf1 crossover), not part of the engine.
"""

from __future__ import annotations

import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: key_domain}; every column in a domain shifts by the same
# stride so cross-table references stay aligned.
SHIFT = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ["region", "nation"]
DOMAIN_COLS = {  # domain -> (table, column) that defines the stride
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main(src: str, dst: str, factor: int) -> None:
    import os

    os.makedirs(dst, exist_ok=True)
    stride = {
        dom: pc.max(pq.read_table(f"{src}/{tbl}.parquet", columns=[col])[col]).as_py() + 1
        for dom, (tbl, col) in DOMAIN_COLS.items()
    }
    for tbl in FIXED:
        pq.write_table(pq.read_table(f"{src}/{tbl}.parquet"), f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied")
    for tbl, cols in SHIFT.items():
        base = pq.read_table(f"{src}/{tbl}.parquet")
        writer = pq.ParquetWriter(f"{dst}/{tbl}.parquet", base.schema)
        for i in range(factor):
            rep = base
            for col, dom in cols.items():
                shifted = pc.add(base[col], i * stride[dom]).cast(base.schema.field(col).type)
                rep = rep.set_column(rep.schema.get_field_index(col), col, shifted)
            writer.write_table(rep)
        writer.close()
        print(f"{tbl}: {base.num_rows} x {factor} = {base.num_rows * factor}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))

"""ext_quality_expectations (r17): the expectation-suite NULL/regex
contracts on crafted hostile rows — NULL passes every rule except its
own not-null rule, a NULL foreign key IS an orphan, and the format
regex's \\z does NOT match before a trailing newline (the Java-$ trap),
identically on both engines."""

import duckdb
import pandas as pd

from flink_cdc_multi_spark.plans.extensions import (
    EXT_ORACLE_SQL,
    ext_quality_expectations,
)


def test_hostile_rows_cross_engine(spark, tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 999, None],  # 999 + NULL: orphans
            "l_quantity": [10.0, 50.0, None, 3.0],  # 50 violates, NULL passes
            "l_discount": [0.0, 0.2, 0.01, None],  # 0.2 violates
            "l_returnflag": ["A", "N", None, "R"],  # N violates, NULL passes
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [7, None, 888],  # NULL + 888: orphans
            "o_totalprice": [5000.0, 200.0, None],  # 200 violates
            "o_orderdate": pd.to_datetime(["2024-01-01", None, "2024-02-02"]),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": [7],
            "c_name": ["Customer#000000007\n"],  # trailing newline: \z rejects
            "c_acctbal": [-5.0],  # violates
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    cust.to_parquet(tmp_path / "customer.parquet")

    got = {
        r["rule"]: (r["n_checked"], r["n_violations"])
        for r in ext_quality_expectations(spark, str(tmp_path)).collect()
    }
    assert got["range: lineitem.l_quantity in [1,45]"] == (4, 1)
    assert got["range: lineitem.l_discount <= 0.05"] == (4, 1)
    assert got["domain: lineitem.l_returnflag in (A,R)"] == (4, 1)
    assert got["range: orders.o_totalprice >= 1000"] == (3, 1)
    assert got["not_null: orders.o_orderdate"] == (3, 1)
    assert got["range: customer.c_acctbal >= 0"] == (1, 1)
    # trailing newline: Java $ would PASS this name; \z must flag it
    assert got["format: customer.c_name"] == (1, 1)
    # NULL FK is an orphan; 999 and 888 don't resolve
    assert got["ri: orders.o_custkey -> customer.c_custkey"] == (3, 2)
    assert got["ri: lineitem.l_orderkey -> orders.o_orderkey"] == (4, 2)

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'"
        )
    oracle = {
        rule: (n, v)
        for rule, n, v in con.execute(
            EXT_ORACLE_SQL["ext_quality_expectations"]
        ).fetchall()
    }
    assert oracle == got

"""r18 wave 3: ext_text_bpe — codegen replace-chain vs the Arrow
rank-dict kernel at the SAME 16-merge table (VERDICT r17 item 3).

The two paths already exist in operators/text.bpe_encode_table (the
chain below MAX_CHAINED_MERGES, the pandas_udf kernel above) and are
pinned bit-identical; this measures which one the REGISTERED 16-merge
query should ride, same-session interleaved ABAB at sf0.1 / sf1 / sf10,
both alternation orders. Ship only on a win at sf1+sf10 (VERDICT).

    python tools/opt_r18_abab_bpe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import text as X  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bpe_query(docs, encoder):
    enc = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.array(encoder(F.col("text")))).alias("bpe")
    )
    return enc.select(
        "doc_id",
        F.when(F.col("bpe") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("bpe"), " ")))
        .cast("bigint")
        .alias("n_bpe"),
        "bpe",
    )


def chain(col):
    return X.bpe_encode_table(col, X.BPE_MERGES)


def kernel(col):
    old = X.MAX_CHAINED_MERGES
    X.MAX_CHAINED_MERGES = 0  # force the Arrow rank-dict path
    try:
        return X.bpe_encode_table(col, X.BPE_MERGES)
    finally:
        X.MAX_CHAINED_MERGES = old


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def abab(sc, variants, rounds: int, tag: str) -> None:
    for order in ("AB", "BA"):
        seq = list(variants.items())
        if order == "BA":
            seq = seq[::-1]
        ts = {k: [] for k in variants}
        for name, df in seq:
            sc.setJobDescription(f"warm {tag} {name}")
            noop(df)
        for i in range(rounds):
            for name, df in seq:
                sc.setJobDescription(f"{tag} {name} {order} r{i}")
                ts[name].append(noop(df))
        med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
        names = list(variants)
        print(f"{tag} order {order}: "
              + "  ".join(f"{k} med {v:.3f}s" for k, v in med.items())
              + f"  ratio {med[names[0]] / med[names[1]]:.2f}x  {ts}")


def main() -> None:
    spark = get_spark("opt_r18_abab_bpe")
    sc = spark.sparkContext

    docs = load_table(spark, SF_DIR, "documents")
    a = bpe_query(docs, chain)
    b = bpe_query(docs, kernel)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, "sf0.1 bpe outputs diverged"
    print(f"sf0.1 equality OK ({len(ra)} rows)")
    abab(sc, {"chain": a, "kernel": b}, rounds=4, tag="sf0.1")

    for tag, d in (("sf1", "/tmp/sf1"), ("sf10", "/tmp/sf10")):
        if not os.path.isdir(d):
            print(f"no {d}; skipping {tag}")
            continue
        docs_n = load_table(spark, d, "documents")
        an = bpe_query(docs_n, chain)
        bn = bpe_query(docs_n, kernel)
        ka = an.agg(F.count("*"), F.sum("n_bpe"),
                    F.sum(F.length("bpe"))).collect()[0]
        kb = bn.agg(F.count("*"), F.sum("n_bpe"),
                    F.sum(F.length("bpe"))).collect()[0]
        assert tuple(ka) == tuple(kb), f"{tag} checksum diverged"
        print(f"{tag} checksum OK {tuple(ka)}")
        abab(sc, {"chain": an, "kernel": bn}, rounds=3, tag=tag)


if __name__ == "__main__":
    main()

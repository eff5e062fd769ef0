"""r18 wave 3b: ext_pack_bpe's count_expr — chain vs Arrow kernel
(the bpe_token_count consumer of the wave-3 result; the counted frame
is persisted, so the encode cost is paid once per execution inside the
prefix-sum build).

    python tools/opt_r18_abab_packbpe.py
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


def pack(docs, kernel):
    return X.pack_offsets(
        docs, "doc_id", "text", block_tokens=256,
        count_expr=X.bpe_token_count(F.col("text"), kernel=kernel),
    )


def pack_old(docs):
    """The pre-r18 counted-frame shape (no count barrier, chain lane) —
    inline replica so the shipped barrier+kernel form measures against
    the exact old plan."""
    from pyspark.sql import functions as F

    n_tok = X.bpe_token_count(F.col("text")).cast("bigint")
    base_rows = docs.select(
        F.col("doc_id"), n_tok.alias("_n")
    ).filter(F.col("_n") > 0)
    # reuse the rest of pack_offsets by handing it the counted frame as
    # a pre-counted input: count_expr reads the materialized column
    return X.pack_offsets(
        base_rows, "doc_id", "_n", block_tokens=256, count_expr=F.col("_n"),
    )


def noop(df) -> float:
    # pack_offsets persists its counted frame; a warm cache would hide
    # the encode cost entirely, so every timed run re-materializes
    df.sparkSession.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("opt_r18_abab_packbpe")
    sc = spark.sparkContext
    for tag, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1"),
                   ("sf10", "/tmp/sf10")):
        if not os.path.isdir(d):
            continue
        docs = load_table(spark, d, "documents")
        a = pack_old(docs)  # pre-r18 shape: unbarriered chain count
        b = pack(docs, kernel=True)  # shipped: barrier + Arrow kernel
        ka = a.agg(F.count("*"), F.sum("n_tokens"), F.sum("start_offset"),
                   F.sum("start_seq"), F.sum("end_seq")).collect()[0]
        kb = b.agg(F.count("*"), F.sum("n_tokens"), F.sum("start_offset"),
                   F.sum("start_seq"), F.sum("end_seq")).collect()[0]
        assert tuple(ka) == tuple(kb), f"{tag} diverged: {ka} vs {kb}"
        print(f"{tag} checksum OK {tuple(ka)}")
        for order in ("AB", "BA"):
            seq = [("old", a), ("new", b)]
            if order == "BA":
                seq = seq[::-1]
            ts = {"old": [], "new": []}
            for name, df in seq:
                sc.setJobDescription(f"warm {tag} {name}")
                noop(df)
            for i in range(3):
                for name, df in seq:
                    sc.setJobDescription(f"{tag} {name} {order} r{i}")
                    ts[name].append(noop(df))
            med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
            print(f"{tag} order {order}: old med {med['old']:.3f}s "
                  f"new med {med['new']:.3f}s "
                  f"ratio {med['old'] / med['new']:.2f}x  {ts}")


if __name__ == "__main__":
    main()

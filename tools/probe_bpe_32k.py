"""32k-merge BPE operating point (r14, VERDICT r13 item 5): measure
bpe_encode_table's pandas_udf fallback at real-tokenizer table sizes
(1k/8k/32k merges) over sf1 documents (50k docs), and A/B the r14
rank-dict word-merge kernel against the r13 rank-scan kernel it
replaced (the rank-scan does `pat in seq` over EVERY rank per doc —
O(|merges|·len); the rank-dict form is |merges|-independent).

    python tools/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
    python tools/probe_bpe_32k.py [sf_dir]

Prints one JSON line per size with sec (min-of-2, noop sink), output
tokens/s/core (32 cores), and the legacy rank-scan kernel's time at the
sizes where it is measurable. Numbers go to PERF.md by hand.
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from flink_cdc_multi_spark.operators import text as X  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def gen_merges(n: int) -> list:
    """Structurally real rank-ordered table: the shipped English merges,
    then letter pairs (level 2), then (2-symbol, letter) and
    (letter, 2-symbol) level-3 merges — every entry is a pair of
    previously-constructible symbols, like a learned table."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = list(X.BPE_MERGES)
    seen = set(out)
    lvl2 = ["".join(p) for p in itertools.product(letters, repeat=2)]
    for p in itertools.product(letters, repeat=2):
        if p not in seen:
            out.append(p)
            seen.add(p)
    for s2 in lvl2:
        for c in letters:
            for p in ((s2, c), (c, s2)):
                if len(out) >= n:
                    return out[:n]
                if p not in seen:
                    out.append(p)
                    seen.add(p)
    raise ValueError(f"cannot generate {n} merges")


def legacy_rank_scan(norm_col, merges):
    """The r13 fallback kernel, kept here as the A/B baseline: full
    `pat in seq` scan over every rank per document."""
    import re as _re

    pats = [(f" {a}  {b} ", f" {a}{b} ") for a, b in merges]

    @F.pandas_udf(T.StringType())
    def enc(s):
        def one(v):
            if v is None:
                return None
            if v == "":
                return ""
            seq = " " + "  ".join(v) + " "
            for pat, rep in pats:
                if pat in seq:
                    seq = seq.replace(pat, rep)
            return _re.sub(" +", " ", seq.strip())

        return s.map(one)

    return enc(norm_col)


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark("probe_bpe_32k")
    # repartition to the core count: the sf1 parquet is 2 files, and a
    # 2-task measurement understates the pipeline by 16x (first run did)
    docs = (
        load_table(spark, sf_dir, "documents").select("text")
        .repartition(CORES)
    )
    docs.persist()
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "cores": CORES}
    for n in (1024, 8192, 32768):
        merges = gen_merges(n)
        df = docs.select(X.bpe_encode_table(F.col("text"), merges).alias("bpe"))
        sec = timed(df)
        n_tokens = df.select(
            F.sum(F.when(F.col("bpe") == "", 0)
                  .otherwise(F.size(F.split("bpe", " ")))).alias("t")
        ).first()["t"]
        out[str(n)] = {
            "sec": sec,
            "tokens": int(n_tokens),
            "tokens_per_s_per_core": int(n_tokens / sec / CORES),
        }
        # legacy kernel A/B where it finishes in reasonable time
        if n <= 8192:
            leg = docs.select(
                legacy_rank_scan(X.bpe_normalize(F.col("text")), merges)
                .alias("bpe")
            )
            out[str(n)]["legacy_rank_scan_sec"] = timed(leg)
    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

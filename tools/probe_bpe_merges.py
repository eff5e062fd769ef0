"""BPE merge-table scale probe (r13, VERDICT r12 item 6): bpe_encode
chains |merges| replace() calls; the shipped table has 16 and codegens
fine, but the PERF.md codegen-bailout lesson (giant flat expressions)
says there is a knee somewhere. Measured findings (PERF.md r13): the
chain stays codegen'd and linear through 256 merges; 384+ overflows the
DRIVER stack at plan construction — so bpe_encode_table dispatches to an
Arrow pandas_udf above MAX_CHAINED_MERGES, which this probe exercises at
384/512 (codegen=false there is the fallback, not a bailout).

Usage: python tools/probe_bpe_merges.py [sf_dir]
Prints one JSON line: {"<n_merges>": {"sec": s, "codegen": bool}, ...}
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators.text import (  # noqa: E402
    MAX_CHAINED_MERGES,
    bpe_encode_table,
)
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def gen_merges(n):
    """Synthetic but structurally real merge table: the first entries are
    the shipped English merges, then letter-pair merges (each a full
    replace() scan over the symbol string, like any cold merge rank)."""
    from flink_cdc_multi_spark.operators.text import BPE_MERGES

    letters = "abcdefghijklmnopqrstuvwxyz"
    extra = [
        (a, b) for a, b in itertools.product(letters, repeat=2)
        if (a, b) not in set(BPE_MERGES)
    ]
    out = list(BPE_MERGES) + extra
    assert n <= len(out)
    return out[:n]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("probe_bpe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.persist().count()
    out = {"max_chained": MAX_CHAINED_MERGES}
    for n in (16, 32, 48, 64, 96, 128, 192, 256, 384, 512):
        try:
            df = docs.select(
                bpe_encode_table(F.col("text"), gen_merges(n)).alias("bpe")
            )
            df.write.format("noop").mode("overwrite").save()  # warm/codegen
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            df.collect()  # materialize an execution for the executed plan
            # executedPlan toString marks whole-stage codegen as "*(n)"
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[str(n)] = {
                "sec": round(best, 3),
                "codegen": "*(" in plan,
            }
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "StackOverflow" in msg or "StackOverflow" in type(e).__name__:
                msg = "StackOverflowError (plan construction)"
            out[str(n)] = {"error": msg[:120]}
    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""r18 wave 2: line_dedup onepass lane (VERDICT r17 item 2).

Equality (hostile fixture + sf0.1 + adversarial) between the onepass
(is_ws, h)-join lane and the r12 broadcast-probe lane, then
same-session interleaved ABAB at sf0.1 and sf10, both alternation
orders. The onepass lane's point is the NON-broadcast regime (at 100 TB
the winners side outgrows the broadcast threshold and the old lane pays
two corpus passes + two sorts), so the sf10 leg also times the old lane
with auto-broadcast disabled (guard forced off — the regime the
operator actually targets).

    python tools/opt_r18_abab_lines.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators.text import line_dedup  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def eq(a_df, b_df, tag: str) -> None:
    a = sorted(map(tuple, a_df.collect()))
    b = sorted(map(tuple, b_df.collect()))
    assert a == b, f"{tag}: diverged\nA={a[:5]}\nB={b[:5]}"
    print(f"{tag}: equality OK ({len(a)} rows)")


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
        base = med[list(variants)[0]]
        print(f"{tag} order {order}: "
              + "  ".join(f"{k} med {v:.3f}s" for k, v in med.items())
              + f"  first/others {[round(base / v, 2) for v in med.values()]}"
              + f"  {ts}")


def main() -> None:
    spark = get_spark("opt_r18_abab_lines")
    sc = spark.sparkContext

    # --- hostile fixture: cross-doc + in-doc duplicate lines,
    # whitespace-only lines (incl. duplicated), trailing empties
    rows = [
        (1, "alpha\nbeta\n\nalpha\ngamma"),        # in-doc repeat + blank
        (2, "beta\n\t\nalpha\n   \ndelta"),        # cross-doc dups + tab/space lines
        (3, "\n\nbeta\nbeta\n"),                   # leading blanks, adjacent repeat, trailing empty
        (4, "   "),                                # whitespace-only doc
        (5, ""),                                   # empty doc -> one empty line
        (6, "unique line"),
    ]
    fix = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    eq(line_dedup(fix, onepass=False), line_dedup(fix, onepass=True),
       "hostile fixture")

    # --- adversarial fixture (duplicate-line rows live there)
    adv = "/tmp/adv_spans_sf"
    if os.path.exists(os.path.join(adv, "documents.parquet")):
        docs = load_table(spark, adv, "documents")
        eq(line_dedup(docs, onepass=False), line_dedup(docs, onepass=True),
           "adversarial sf")

    # --- sf0.1 equality + ABAB
    docs = load_table(spark, SF_DIR, "documents")
    old = line_dedup(docs, onepass=False)
    new = line_dedup(docs, onepass=True)
    eq(old, new, "sf0.1")
    abab(sc, {"old": old, "onepass": new}, rounds=4, tag="sf0.1")

    # --- executed-plan reuse check: the onepass exchange must be
    # consumed by BOTH branches at runtime (one scan, one Generate)
    new.collect()
    plan = new._jdf.queryExecution().executedPlan().toString()
    n_scan = plan.count("Scan parquet")
    n_reuse = plan.count("ReusedExchange") + plan.count("ReusedQueryStage")
    print(f"onepass executed plan: {n_scan} parquet scans, "
          f"{n_reuse} reused exchange nodes")

    # --- sf10
    sf10 = "/tmp/sf10"
    if not os.path.isdir(sf10):
        print("no /tmp/sf10; skipping sf10 leg")
        return
    docs10 = load_table(spark, sf10, "documents")
    old10 = line_dedup(docs10, onepass=False)
    new10 = line_dedup(docs10, onepass=True)
    ks = []
    for df in (old10, new10):
        r = df.agg(
            F.count("*"), F.sum("n_kept"), F.sum("n_dropped"),
            F.sum(F.length("clean_text")),
        ).collect()[0]
        ks.append(tuple(r))
    assert ks[0] == ks[1], f"sf10 checksum diverged: {ks}"
    print(f"sf10 checksum OK {ks[0]}")
    abab(sc, {"old": old10, "onepass": new10}, rounds=3, tag="sf10")

    # the non-broadcast regime: force the old lane's auto-broadcast off
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        old10nb = line_dedup(docs10, onepass=False)
        new10nb = line_dedup(docs10, onepass=True)
        abab(sc, {"old_nobcast": old10nb, "onepass": new10nb}, rounds=3,
             tag="sf10-nobcast")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()

"""Trained-vs-fixed coarse quantizer quality for SemDeDup (VERDICT r14
item 6) — the semantic-dedup analogue of the r13 ANN recall table.

For the gated corpus scope (vec_id < 5000, dim 64, threshold 0.35):

- GROUND TRUTH: the quantization-free SemDeDup result — a vector is
  dropped iff SOME lower-id neighbor anywhere in the corpus has cosine
  >= threshold (what an exact all-pairs pass would drop). Computed
  driver-side in numpy (the scope is bounded by contract).
- dup recall: |dropped_by_variant ∩ dropped_truth| / |dropped_truth| —
  how much of the true duplicate mass each cell layout finds (in-cell
  search misses cross-cell neighbors; better-balanced, better-centered
  cells should cut fewer neighborhoods apart).
- cluster balance: max cell size / mean cell size — bounds the slowest
  in-cell quadratic task at a fixed n_centroids knob.

Usage: python tools/measure_semdedup_trained.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_cdc_multi_spark.operators import dedup as D  # noqa: E402
from flink_cdc_multi_spark.operators import similarity as S  # noqa: E402
from flink_cdc_multi_spark.plans.queries import load_table  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.35
DIM = 64


def truth_dropped(ids: np.ndarray, mat: np.ndarray) -> set[int]:
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    ok = norms > 0
    cos = np.zeros((len(ids), len(ids)))
    cos[np.ix_(ok, ok)] = (mat[ok] / norms[ok, None]) @ (mat[ok] / norms[ok, None]).T
    dropped = set()
    for j in range(len(ids)):
        if np.any(cos[:j, j] >= THRESHOLD):
            dropped.add(int(ids[j]))
    return dropped


def variant_metrics(result_df, truth: set[int]) -> dict:
    rows = result_df.collect()
    dropped = {r["vec_id"] for r in rows if not r["kept"]}
    sizes = {}
    for r in rows:
        sizes[r["cell"]] = sizes.get(r["cell"], 0) + 1
    mean = sum(sizes.values()) / len(sizes)
    return {
        "n_dropped": len(dropped),
        "dup_recall": round(len(dropped & truth) / len(truth), 4) if truth else None,
        "false_drops": len(dropped - truth),
        "n_cells_used": len(sizes),
        "max_cell": max(sizes.values()),
        "balance_max_over_mean": round(max(sizes.values()) / mean, 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("semdedup-quality")
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5000)
    emb = S.valid_vectors(emb, DIM, "embedding")
    local = emb.select("vec_id", F.col("embedding").cast("array<double>")).collect()
    ids = np.array([r["vec_id"] for r in local])
    mat = np.stack([np.asarray(r["embedding"]) for r in local])
    truth = truth_dropped(ids, mat)

    fixed_cents = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 36))
    fixed = D.semantic_dedup(emb, fixed_cents, dim=DIM, threshold=THRESHOLD)
    tc = S.train_ivf_centroids(emb, n_cells=16, dim=DIM)
    trained = D.semantic_dedup(
        emb, None, dim=DIM, threshold=THRESHOLD, trained_centroids=tc
    )
    out = {
        "sf_dir": sf_dir,
        "n_vectors": int(len(ids)),
        "truth_dropped": len(truth),
        "fixed": variant_metrics(fixed, truth),
        "trained": variant_metrics(trained, truth),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

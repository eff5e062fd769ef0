"""Recall@k of the IVF-PQ variants vs exact L2 — the r12/r13 codebook
story measured (PERF.md): raw PQ vs residual PQ with UNTRAINED (fixed
data-vector) codewords, vs residual PQ with TRAINED codewords
(train_pq_codewords — per-subspace kmeans on residuals, the FAISS form).

Setup mirrors the r12 characterization: a clustered corpus (true
Gaussian clusters, unit-ish scale), fixed coarse centroids = the first
16 corpus vectors, fixed untrained codebook = the next 16 corpus
vectors; queries are small perturbations of random corpus points, so
exact top-3 is a meaningful target.

Usage: python tools/recall_pq.py [n_corpus] [dim] [n_queries]
Prints one JSON line with recall@3 for all three variants.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from flink_cdc_multi_spark.operators import similarity as S  # noqa: E402
from flink_cdc_multi_spark.session import get_spark  # noqa: E402


def exact_top3(corpus_q, queries_q, nids):
    """Exact L2 top-3 in the SAME int64-quantized space the PQ paths
    score in (ties to lowest nid — the engine contract)."""
    out = []
    for q in queries_q:
        d2 = ((corpus_q - q[None, :]) ** 2).sum(-1)
        order = np.lexsort((nids, d2))[:3]
        out.append(set(nids[order].tolist()))
    return out


def recall_at3(result_rows, exact_sets, qids):
    got = {}
    for r in result_rows:
        got.setdefault(r["qid"], set()).add(r["nid"])
    hits = sum(
        len(got.get(int(q), set()) & exact_sets[i]) for i, q in enumerate(qids)
    )
    return hits / (3 * len(qids))


def main():
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    rng = np.random.RandomState(7)
    n_clusters = 16
    means = rng.standard_normal((n_clusters, dim)) * 1.0
    assign = rng.randint(n_clusters, size=n_corpus)
    vecs = means[assign] + rng.standard_normal((n_corpus, dim)) * 0.3

    spark = get_spark("recall_pq")
    corpus_rows = [(i + 100, v.tolist()) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    centroids = corpus.filter(f"vec_id < {100 + n_clusters}")
    qsrc = rng.choice(n_corpus, size=n_queries, replace=False)
    queries = spark.createDataFrame(
        [
            (i, (vecs[qsrc[i]] + rng.standard_normal(dim) * 0.1).tolist())
            for i in range(n_queries)
        ],
        "vec_id long, embedding array<double>",
    )

    nids = np.arange(n_corpus, dtype=np.int64) + 100
    corpus_q = np.floor(vecs * S.LSH_QUANT).astype(np.int64)
    qrows = sorted(queries.collect())
    qids = [r["vec_id"] for r in qrows]
    queries_q = np.floor(
        np.stack([np.asarray(r["embedding"]) for r in qrows]) * S.LSH_QUANT
    ).astype(np.int64)
    exact = exact_top3(corpus_q, queries_q, nids)

    def run(n_codewords, residual, trained):
        # untrained codebook = the next n_codewords corpus data vectors
        # (the fixed-model shape the gated queries use)
        codebook = corpus.filter(
            f"vec_id >= {100 + n_clusters} "
            f"and vec_id < {100 + n_clusters + n_codewords}"
        )
        tw = (
            S.train_pq_codewords(
                corpus, centroids, m=8, n_codewords=n_codewords
            )
            if trained
            else None
        )
        df = S.ivf_pq_topk_fixed(
            corpus, queries, centroids, codebook, m=8, k=3, n_probe=4,
            residual=residual, trained_codewords=tw,
        )
        return recall_at3(df.collect(), exact, qids)

    out = {"n_corpus": n_corpus, "dim": dim, "n_queries": n_queries}
    for ncw in (16, 64):
        out[f"recall_raw_pq_{ncw}"] = round(run(ncw, False, False), 3)
        out[f"recall_residual_untrained_{ncw}"] = round(run(ncw, True, False), 3)
        out[f"recall_residual_trained_{ncw}"] = round(run(ncw, True, True), 3)
    # fully trained (r13): trained coarse cells + codewords trained on
    # THEIR residuals — the complete FAISS train pipeline
    tc = S.train_ivf_centroids(corpus, n_cells=n_clusters, dim=dim)
    tw = S.train_pq_codewords(
        corpus, None, m=8, n_codewords=64, trained_centroids=tc
    )
    df = S.ivf_pq_topk_fixed(
        corpus, queries, None, None, m=8, k=3, n_probe=4,
        residual=True, trained_codewords=tw, trained_centroids=tc,
    )
    out["recall_fully_trained_64"] = round(
        recall_at3(df.collect(), exact, qids), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""A/B: fixed-sample vs trained (per-subspace k-means) PQ codebook on a
clustered, cluster-ordered synthetic corpus (the ivf_ab.py adversary).

The fixed-sample codebook takes the n_cents lowest vec_ids as centroids in
EVERY subspace; on a corpus whose row order correlates with content those
rows are homogeneous, so most centroids quantize one region and ADC scores
collapse. The trained codebook runs one Euclidean k-means per subspace over
that subspace's own projection, allocating centroids by density.

Metrics: recall@5 vs exact cosine is reported but NOT the headline — at
16 centroids/subspace every member of a tight cluster shares the same
codes, so within-cluster neighbor order is unrecoverable BY DESIGN for
both codebooks (PQ is a coarse compressor; deployments rerank survivors,
sim_sq8_rerank-style). The metrics a codebook controls are (a)
cluster_precision@5 — do ADC hits come from the query's true cluster —
and (b) mean subspace quantization error (the PQ objective itself).

Prints one JSON line:
  {"n": ..., "dim": ..., "m": ..., "n_cents": ...,
   "sample": {"recall_at_5": ..., "cluster_precision_at_5": ..., "mse": ...},
   "kmeans": {...}}

Run: python scripts/pq_ab.py [N] (default 20000)
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from medical_doc_knowledge_graph_system_spark.functions.simsearch import (  # noqa: E402
    pq_codebook,
    pq_codebook_kmeans,
    topk_cosine,
    topk_pq,
)
from medical_doc_knowledge_graph_system_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
DIM = 64
M = 4
N_CENTS = 16
N_CLUSTERS = 8
NOISE = 0.08
N_QUERIES = 64
SEED = 1234


def make_corpus(rng):
    """Zipf-sized tight clusters, rows ORDERED BY CLUSTER (ids 0..N0 all
    cluster 0 — the time/domain-ordered crawl shape)."""
    sizes = np.array([1.0 / (j + 1) for j in range(N_CLUSTERS)])
    sizes = np.maximum((sizes / sizes.sum() * N).astype(int), 1)
    sizes[0] += N - sizes.sum()
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, labels = [], []
    for j, sz in enumerate(sizes):
        pts = centers[j] + NOISE * rng.normal(size=(sz, DIM))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        rows.append(pts)
        labels += [j] * sz
    return np.vstack(rows), np.array(labels)


def main():
    rng = np.random.default_rng(SEED)
    X, labels = make_corpus(rng)
    spark = get_spark("pq_ab", cores=16)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(N)],
        "vec_id bigint, embedding array<double>",
    ).repartition(16).localCheckpoint()
    q_idx = rng.choice(N, size=N_QUERIES, replace=False)
    queries = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in q_idx],
        "query_id bigint, q_embedding array<double>",
    ).localCheckpoint()

    exact = {}
    for r in topk_cosine(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    out = {"n": N, "dim": DIM, "m": M, "n_cents": N_CENTS, "noise": NOISE}
    sd = DIM // M
    for name, cb in [
        ("sample", pq_codebook(emb, m=M, n_cents=N_CENTS, dims=DIM)),
        ("kmeans", pq_codebook_kmeans(emb, m=M, n_cents=N_CENTS, dims=DIM)),
    ]:
        cb = cb.localCheckpoint()
        got = {}
        for r in topk_pq(
            emb, queries, k=5, m=M, n_cents=N_CENTS, dims=DIM, codebook=cb
        ).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        recall = float(
            np.mean(
                [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
            )
        )
        # cluster precision: ADC hits sharing the query's true cluster
        prec = float(
            np.mean(
                [
                    np.mean([labels[v] == labels[q] for v in vs])
                    for q, vs in got.items()
                ]
            )
        )
        # quantization MSE: mean over (vector, subspace) of the distance
        # to the assigned centroid — the k-means objective PQ minimizes
        C = {(r.cell, r.sub): np.array(r.c_sub) for r in cb.collect()}
        sub = X.reshape(N, M, sd)
        mse = 0.0
        for j in range(M):
            cents_j = np.stack([C[(c, j)] for c in range(N_CENTS)])
            d2 = ((sub[:, j, None, :] - cents_j[None]) ** 2).sum(-1)
            mse += float(d2.min(axis=1).mean())
        out[name] = {
            "recall_at_5": round(recall, 4),
            "cluster_precision_at_5": round(prec, 4),
            "mse": round(mse / M, 6),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

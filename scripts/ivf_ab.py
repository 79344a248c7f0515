"""A/B: fixed-sample vs trained (k-means||) IVF quantizer on a CLUSTERED,
cluster-ordered synthetic corpus (VERDICT r3 #2).

The adversarial-but-realistic input for the fixed-sample quantizer is a
corpus whose row order correlates with content (a crawl ordered by domain or
time): the n_cells smallest vec_ids then all come from one region, so every
centroid lands in one cluster and the remaining clusters collapse into a few
hot cells. The trained quantizer allocates centroids by density and must
hold recall with materially lower cell-size skew.

Prints one JSON line:
  {"n": ..., "dim": ..., "n_cells": ..., "nprobe": ...,
   "sample": {"skew_max_over_mean": ..., "recall_at_5": ...},
   "kmeans": {"skew_max_over_mean": ..., "recall_at_5": ...}}

Run: python scripts/ivf_ab.py [N] (default 20000)
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from medical_doc_knowledge_graph_system_spark.functions.simsearch import (  # noqa: E402
    ivf_assign,
    ivf_centroids,
    ivf_centroids_kmeans,
    topk_cosine,
    topk_cosine_ivf,
)
from medical_doc_knowledge_graph_system_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
DIM = 32
# two operating points: cells == true clusters (the adapted-quantizer case)
# and cells >> clusters (the sub-split case, where sample-centroid skew is
# worst); nprobe keeps the scanned fraction comparable (2/8 vs 4/32)
CONFIGS = [(8, 2), (32, 4)]
N_CLUSTERS = 8
NOISE = 0.08
N_QUERIES = 64
SEED = 1234


def make_corpus(rng):
    """Zipf-sized tight clusters; rows ORDERED BY CLUSTER (ids 0..N0 are all
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
    X, _ = make_corpus(rng)
    spark = get_spark("ivf_ab", cores=16)
    emb = spark.createDataFrame(
        [(f"v{i:06d}", [float(v) for v in X[i]]) for i in range(N)],
        "vec_id string, embedding array<double>",
    ).repartition(16).localCheckpoint()
    q_idx = rng.choice(N, size=N_QUERIES, replace=False)
    queries = spark.createDataFrame(
        [(f"v{i:06d}", [float(v) for v in X[i]]) for i in q_idx],
        "query_id string, q_embedding array<double>",
    ).localCheckpoint()

    exact = {}
    for r in topk_cosine(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    out = {"n": N, "dim": DIM, "noise": NOISE, "configs": []}
    for n_cells, nprobe in CONFIGS:
        cfg = {"n_cells": n_cells, "nprobe": nprobe}
        for name, cents in [
            ("sample", ivf_centroids(emb, n_cells)),
            ("kmeans", ivf_centroids_kmeans(emb, n_cells, seed=42)),
        ]:
            cents = cents.localCheckpoint()
            sizes = [
                r["count"]
                for r in ivf_assign(emb, n_cells, cents=cents)
                .groupBy("cell")
                .count()
                .collect()
            ]
            skew = max(sizes) / (N / n_cells)
            got = {}
            for r in topk_cosine_ivf(
                emb, queries, k=5, n_cells=n_cells, nprobe=nprobe, cents=cents
            ).collect():
                got.setdefault(r.query_id, set()).add(r.vec_id)
            recall = float(
                np.mean(
                    [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
                )
            )
            cfg[name] = {
                "skew_max_over_mean": round(skew, 2),
                "recall_at_5": round(recall, 4),
                "nonempty_cells": len(sizes),
            }
        out["configs"].append(cfg)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

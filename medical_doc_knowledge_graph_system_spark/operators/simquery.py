"""Vector scoring helpers for query-time similarity (E1/A10)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cosine_score_col(emb_col: Column, query_vec: list[float]) -> Column:
    """cosine(embedding, constant query vector) as a pure column expression
    (dot/(|a||b|+eps), the reference formula app/rag/embeddings.py:57-61).
    JVM-side: no Python in the scoring scan."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    dot = F.aggregate(
        F.zip_with(emb_col, q, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    na = F.sqrt(F.aggregate(F.transform(emb_col, lambda x: x * x), F.lit(0.0), lambda a, v: a + v))
    nq = float(sum(v * v for v in query_vec)) ** 0.5
    return dot / (na * F.lit(nq) + F.lit(1e-10))

"""Similarity search over an embedding column (array<float>).

  * brute-force cosine top-k — the exact baseline (reference E1/A10,
    app/rag/vector_rag.py:56-62 ChromaDB top-k replaced by a scored
    cross-join + TakeOrderedAndProject).
  * sign-block near-dup — LSH-style blocking on the sign pattern of the
    leading dimensions (deterministic, SQL-oracle-able), cosine verify on
    blocked pairs only: the scale path for all-pairs near-dup.
  * IVF — deterministic coarse quantizer (centroids = a fixed sample of the
    vectors), search restricted to the query's nearest cell: the scale path
    for top-k (cells ≈ sqrt(N) at 100 TB, each probe scans one cell).

All cosine math is explicit dot/(norm*norm) with round(4) so the DuckDB
oracle (list_dot_product) matches bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def topk_cosine(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """For each query vector, the k nearest vectors by cosine (excluding
    itself): (query_id, vec_id, score, rank). queries: (query_id, q_embedding).
    Broadcast the query side — it is always the small dimension."""
    scored = embeddings.join(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 4).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def sign_block_key(emb_col, bits: int = 8):
    """Blocking key from the sign pattern of the first `bits` dimensions."""
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(emb_col, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ],
    )


def neardup_pairs_signblock(
    embeddings: DataFrame, threshold: float = 0.95, bits: int = 8
) -> DataFrame:
    """Near-duplicate vector pairs: sign-pattern block, then exact cosine
    verify on within-block pairs only. (vec_a, vec_b, score)."""
    keyed = embeddings.select(
        "vec_id", "embedding", sign_block_key(F.col("embedding"), bits).alias("blk")
    )
    l = keyed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "blk"
    )
    r = keyed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "blk"
    )
    pairs = l.join(r, "blk").where(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 4).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def ivf_assign(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """Deterministic IVF coarse quantizer: centroids are the embeddings of
    the n_cells smallest vec_ids (a fixed 'training sample'); every vector is
    assigned to its max-cosine centroid. Returns (vec_id, embedding, cell)."""
    cents = (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )
    scored = embeddings.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cell",
        F.round(cosine_col(F.col("embedding"), F.col("c_emb")), 6).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )


def topk_cosine_ivf(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, n_cells: int = 16
) -> DataFrame:
    """IVF top-k: probe only the query's own cell (nprobe=1). Approximate —
    documented recall tradeoff vs topk_cosine; at scale each probe touches
    1/n_cells of the data."""
    assigned = ivf_assign(embeddings, n_cells)
    q = assigned.join(
        queries.select(F.col("query_id").alias("vec_id"), "q_embedding"), "vec_id"
    ).select(F.col("vec_id").alias("query_id"), "q_embedding", F.col("cell").alias("q_cell"))
    scored = (
        assigned.join(F.broadcast(q), assigned.cell == q.q_cell)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )

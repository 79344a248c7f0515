"""Embedding stage: deterministic text embeddings as an Arrow-batched
pandas UDF.

The reference embeds chunks with MiniLM-L6-v2 (app/rag/embeddings.py:41-54,
384-d, L2-normalized, stored as a node property). Model downloads are
unavailable here, so the engine uses the deterministic char-n-gram hashing
embedding from corelib.similarity (SURVEY §7.3.5) — the semantics under test
("cosine >= threshold => related") are preserved, and swapping in a real
model is a one-function change (iterator-style UDF already loads the encoder
once per worker, the pattern a torch model needs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corelib.similarity import EMBED_DIM, embed_name


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # iterator form: per-worker setup (e.g. model load) happens once here
    for batch in texts:
        yield batch.map(lambda t: embed_name(t or ""))


def embed_chunks(chunks: DataFrame, embedder=None) -> DataFrame:
    """chunks -> (chunk_id, url, embedding array<float>[EMBED_DIM]).

    `embedder`: optional corpus-trained backend (operators.embed_tfidf
    .TfidfEmbedder, VERDICT r4 #3) — same output schema and unit-norm
    contract, JVM-only plan (no Arrow round-trip). Default stays the
    deterministic hash featurizer, which needs no fit step."""
    if embedder is not None:
        return embedder.embed(chunks, text_col="text").select(
            "chunk_id", "url", "embedding"
        )
    return chunks.select(
        "chunk_id", "url", embed_udf(F.col("text")).alias("embedding")
    )


__all__ = ["EMBED_DIM", "embed_chunks", "embed_udf"]

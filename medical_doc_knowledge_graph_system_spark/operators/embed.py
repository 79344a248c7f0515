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

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corelib.similarity import EMBED_DIM, _gram_feature, char_ngrams, embed_name


def _embed_batch(texts: pd.Series) -> pd.Series:
    """Vectorized embed_name over a batch — bit-identical outputs (r6,
    guide §4.2: hand whole batches to NumPy instead of looping in Python).

    Identity argument: embed_name accumulates ±1.0 per DISTINCT gram into a
    float64 vector — every intermediate is a small integer, exact in
    float64, so the accumulation ORDER cannot matter; the squared norm is a
    sum of exact integer squares; only the final division produces
    non-integers, and it is the same scalar division per component. A
    bincount-based accumulation therefore reproduces embed_name
    bit-for-bit (pinned by tests/test_embed_vectorized_parity)."""
    grams_per = [char_ngrams(t or "") for t in texts]
    flat = [g for gs in grams_per for g in gs]
    if not flat:
        return pd.Series([[0.0] * EMBED_DIM for _ in grams_per])
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    uidx = np.empty(len(uniques), dtype=np.int64)
    usign = np.empty(len(uniques), dtype=np.float64)
    for i, g in enumerate(uniques):
        uidx[i], usign[i] = _gram_feature(g, EMBED_DIM)
    gidx = uidx[codes]
    gsign = usign[codes]
    out = []
    pos = 0
    for gs in grams_per:
        k = len(gs)
        vec = np.bincount(
            gidx[pos : pos + k], weights=gsign[pos : pos + k], minlength=EMBED_DIM
        )
        pos += k
        nrm = math.sqrt(float(np.dot(vec, vec)))
        out.append((vec / nrm).tolist() if nrm else vec.tolist())
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # iterator form: per-worker setup (e.g. model load) happens once here
    for batch in texts:
        yield _embed_batch(batch)


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

"""Corpus-trained TF-IDF embedding backend (VERDICT r4 #3).

The reference embeds with MiniLM-L6-v2 (app/rag/embeddings.py:41-54); no
model download exists in this sandbox, so the default backend is the
deterministic char-n-gram hashing featurizer (corelib.similarity.embed_name,
SURVEY §7.3.5). This module narrows the remaining semantic-quality gap
WITHOUT any download: the same char-3-gram feature space, but with
CORPUS-TRAINED inverse-document-frequency weights — common grams (" th",
"he ", template boilerplate) are downweighted, discriminative grams
dominate the cosine, which is the first-order effect a trained encoder
adds over naive hashing.

Everything runs JVM-side (pyspark.ml HashingTF -> IDFModel -> Normalizer,
then vector_to_array): no Python UDF in the embed path at all — unlike the
hash backend, which needs an Arrow round-trip per batch. The gram
tokenization is the exact columnar equivalent of corelib.char_ngrams
(pad with single spaces, distinct 3-grams), so the two backends embed the
same gram sets and differ only in weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corelib.similarity import EMBED_DIM

_GRAM_N = 3


def char_gram_col(col: F.Column) -> F.Column:
    """Columnar corelib.char_ngrams: ' ' + lower(strip(s)) + ' ' -> distinct
    char 3-grams (the whole padded string when shorter than 3)."""
    # null-safe: a null text embeds like '' (matching embed_name(t or ""))
    s = F.concat(F.lit(" "), F.trim(F.lower(F.coalesce(col, F.lit("")))), F.lit(" "))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - (_GRAM_N - 1)),
        lambda i: s.substr(i, F.lit(_GRAM_N)),
    )
    return F.when(F.length(s) < _GRAM_N, F.array(s)).otherwise(
        F.array_distinct(grams)
    )


class TfidfEmbedder:
    """A fitted TF-IDF embedding backend: embed() adds an L2-normalized
    array<float> column. Drop-in alternative to the hash featurizer —
    same dimensionality, same 'cosine >= threshold => related' contract."""

    def __init__(self, idf_model, dim: int = EMBED_DIM):
        self.idf_model = idf_model
        self.dim = dim

    def embed(
        self, df: DataFrame, text_col: str = "text", out_col: str = "embedding"
    ) -> DataFrame:
        from pyspark.ml.feature import HashingTF, Normalizer
        from pyspark.ml.functions import vector_to_array

        tf = HashingTF(
            inputCol="__grams", outputCol="__tf", numFeatures=self.dim, binary=True
        )
        self.idf_model.setInputCol("__tf").setOutputCol("__tfidf")
        norm = Normalizer(inputCol="__tfidf", outputCol="__vec", p=2.0)
        staged = df.withColumn("__grams", char_gram_col(F.col(text_col)))
        out = norm.transform(self.idf_model.transform(tf.transform(staged)))
        return out.withColumn(
            out_col,
            vector_to_array(F.col("__vec")).cast("array<float>"),
        ).drop("__grams", "__tf", "__tfidf", "__vec")


def fit_tfidf_embedder(
    corpus: DataFrame, text_col: str = "text", dim: int = EMBED_DIM
) -> TfidfEmbedder:
    """Fit IDF weights over a corpus (one distributed pass: gram explode ->
    hashed TF -> document-frequency aggregate). At 100 TB the fit input
    should be a SAMPLE of the corpus — IDF weights converge long before the
    full corpus is seen; pass corpus.sample(...) in that regime."""
    from pyspark.ml.feature import HashingTF, IDF

    tf = HashingTF(
        inputCol="__grams", outputCol="__tf", numFeatures=dim, binary=True
    )
    staged = corpus.withColumn("__grams", char_gram_col(F.col(text_col)))
    idf = IDF(inputCol="__tf", outputCol="__tfidf", minDocFreq=0)
    model = idf.fit(tf.transform(staged))
    return TfidfEmbedder(model, dim)


__all__ = ["TfidfEmbedder", "char_gram_col", "fit_tfidf_embedder"]

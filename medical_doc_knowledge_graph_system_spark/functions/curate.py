"""Corpus curation: the composed training-data cleaning job.

One declarative pass turns a raw documents table into a training-ready
subset — the operation a 100 TB LLM-data pipeline runs before anything
else. Composes the individually-gated operators (language-ID, quality
scoring, exact dedup, MinHash-LSH near-dedup) without forking any of their
logic:

  keep a document iff
    * its language guess matches `lang` (textfns.lang_argmax),
    * its 4dp-rounded quality score >= min_quality (textfns.quality_cols),
    * it is the min-doc_id member of its byte-identical group
      (exact dedup, one window over md5(text)),
    * it never appears as the dropped side (doc_b; pairs always emit
      doc_a < doc_b) of a MinHash-LSH near-duplicate pair
      (dedup.minhash_band_pairs — bucket-capped, never all-pairs).

Scale shape: lang/quality are pure column expressions fused into the scan
projection; exact dedup is ONE shuffle on md5(text); near-dedup is the
bounded LSH pipeline; the final exclusion is a left-anti join on doc_id
(AQE broadcasts the loser set when it is small, which it is by
construction — only near-dup losers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import minhash_band_pairs
from .textfns import lang_argmax, lang_score_cols, quality_cols


def curate_docs(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.45,
    text_col: str = "text",
) -> DataFrame:
    """documents -> curated (doc_id, lang_guess, token_count, quality_score)."""
    q = quality_cols(text_col)
    w = Window.partitionBy(F.md5(F.col(text_col)))
    scored = docs.select(
        "doc_id",
        lang_argmax(lang_score_cols(text_col)).alias("lang_guess"),
        q["token_count"].alias("token_count"),
        F.round(q["quality_score"], 4).alias("quality_score"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("__keep_exact"),
    )
    kept = scored.where(
        (F.col("lang_guess") == lang)
        & (F.col("quality_score") >= min_quality)
        & F.col("__keep_exact")
    ).drop("__keep_exact")
    near_losers = (
        minhash_band_pairs(docs, text_col)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return kept.join(near_losers, "doc_id", "left_anti")

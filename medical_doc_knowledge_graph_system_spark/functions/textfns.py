"""Text-analysis functions over a documents table — all pure Catalyst
column expressions (JVM-side, whole-stage codegen; no Python in the hot
path), each with an exact ANSI-SQL oracle equivalent.

Operators: token counting, quality scoring, language-ID heuristic, document
fingerprinting (SURVEY 'training-data pipeline' additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens_col(text_col: str = "text"):
    """Single-space tokenization of trimmed, lowercased text (literal ' '
    split — matches DuckDB string_split exactly, including empty tokens on
    double spaces, so oracles compare bit-for-bit)."""
    return F.split(F.lower(F.trim(F.col(text_col))), " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count, distinct_token_count, avg_token_len (rounded 4dp)."""
    toks = tokens_col(text_col)
    return df.select(
        "doc_id",
        F.size(toks).alias("token_count"),
        F.size(F.array_distinct(toks)).alias("distinct_token_count"),
        F.round(
            F.length(F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", ""))
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword/alpha-ratio quality heuristic in [0,1].

    score = 0.4*min(token_count/100, 1) + 0.3*stopword_ratio_norm +
            0.3*alpha_ratio; all components deterministic column exprs.
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(_EN_STOPWORDS))
    )
    stop_ratio = stop_hits / n
    txt = F.lower(F.trim(F.col(text_col)))
    alpha_ratio = F.length(F.regexp_replace(txt, "[^a-z]", "")) / F.length(txt)
    score = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * 2.0, F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
    )
    return df.select(
        "doc_id",
        F.col("n_chars"),
        n.alias("token_count"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language-ID heuristic: argmax over per-language
    marker hit counts, 'und' (undetermined) when all zero. Deterministic
    tie-break by language code ascending."""
    toks = tokens_col(text_col)

    def _marker_filter(markers: list[str]):
        # NB: F.filter treats a 2-arg lambda as (element, index) — a default
        # arg would be bound to the index column; close over markers instead.
        return lambda t: t.isin(markers)

    scores = [
        F.size(F.filter(toks, _marker_filter(markers))).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select("doc_id", F.col("lang").alias("lang_actual"), *scores)
    langs = sorted(LANG_MARKERS)
    # argmax with deterministic tiebreak: greatest struct(score, reverse-lang)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lg}").alias("s"),
                F.lit(len(langs) - i).alias("prio"),
                F.lit(lg).alias("lg"),
            )
            for i, lg in enumerate(langs)
        ]
    )
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        "lang_actual",
        F.when(best["s"] > 0, best["lg"]).otherwise(F.lit("und")).alias("lang_guess"),
        *[F.col(f"score_{lg}") for lg in langs],
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized document fingerprint: md5 over the sorted distinct token
    set (shingle-set hash — robust to token order, like a sorted n-gram
    fingerprint). md5 is identical in Spark and DuckDB, so exact-oracle-able."""
    toks = tokens_col(text_col)
    return df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))).alias("fingerprint"),
    )

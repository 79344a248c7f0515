"""KG construction operators instantiated over the driver's `documents`
table (doc_id, text, lang, source, n_chars).

Same operator shapes as the medical pipeline (gazetteer broadcast join ->
mention detection -> pattern-join relation extraction -> aggregation ->
k-hop), but with a gazetteer over the synthetic corpus vocabulary and done
entirely in Catalyst column expressions so every step has an exact ANSI-SQL
DuckDB oracle. The SQL strings are generated from the same dicts used by the
DataFrame code, so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# term -> label over the synthetic documents vocabulary
WEB_GAZETTEER: dict[str, str] = {
    "join": "Operator",
    "scan": "Operator",
    "filter": "Operator",
    "sort": "Operator",
    "merge": "Operator",
    "agg": "Operator",
    "window": "Operator",
    "group": "Operator",
    "hash": "Operator",
    "table": "Structure",
    "row": "Structure",
    "column": "Structure",
    "key": "Structure",
    "vector": "Structure",
    "line": "Structure",
    "part": "Structure",
    "spark": "System",
    "stream": "System",
    "batch": "System",
    "query": "System",
    "fast": "Quality",
    "slow": "Quality",
    "small": "Quality",
    "big": "Quality",
}

# (subj_label, pred, obj_label) relation patterns (co-occurrence in a doc)
WEB_REL_PATTERNS: list[tuple[str, str, str]] = [
    ("System", "EXECUTES", "Operator"),
    ("Operator", "APPLIED_TO", "Structure"),
    ("Quality", "DESCRIBES", "Operator"),
]


def gazetteer_values_sql() -> str:
    """VALUES list for the DuckDB oracle — generated from WEB_GAZETTEER."""
    rows = ", ".join(f"('{t}', '{l}')" for t, l in sorted(WEB_GAZETTEER.items()))
    return f"(VALUES {rows}) AS gaz(term, label)"


def patterns_values_sql() -> str:
    rows = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in WEB_REL_PATTERNS)
    return f"(VALUES {rows}) AS pat(src_label, pred, dst_label)"


def _tokens():
    return F.split(F.lower(F.trim(F.col("text"))), " ")


def doc_mentions(docs: DataFrame) -> DataFrame:
    """(doc_id, term, label): gazetteer terms present in each document.

    Explode the per-doc DISTINCT token set and broadcast-HASH-join it to the
    gazetteer dimension (C1 shape): one hash probe per token instead of
    |gazetteer| array_contains evaluations per doc (which plans as a
    BroadcastNestedLoopJoin). Measured at 200k docs / 16 cores: within noise
    of the BNLJ at this 24-term gazetteer, 6.4x faster at a 2,000-term
    dictionary (0.58 s vs 3.73 s medians) — the hash probe is O(tokens)
    regardless of dictionary size, which is the shape that survives
    open-vocabulary dictionary growth. array_distinct first means matches
    are already unique per (doc, term): no dedup, no shuffle; no Python
    anywhere.
    """
    spark = docs.sparkSession
    gaz = spark.createDataFrame(
        sorted(WEB_GAZETTEER.items()), schema="term string, label string"
    )
    from ..operators.skew import ensure_parallelism

    toks = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("tok")
    )
    return toks.join(F.broadcast(gaz), toks.tok == gaz.term).select(
        "doc_id", "term", "label"
    )


def mention_counts(docs: DataFrame) -> DataFrame:
    """Docs-per-term counts (D2 analogue), ordered deterministically."""
    return (
        doc_mentions(docs)
        .groupBy("term", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def doc_triples(docs: DataFrame, mentions: DataFrame | None = None) -> DataFrame:
    """Aggregated (subj, pred, obj, n_docs): pattern-join relation extraction
    (broadcast pattern dim + per-doc self-join, the C5/derive_triples shape).

    Pass a pre-pinned `mentions` frame (doc_mentions output, e.g.
    localCheckpointed) when the caller also references mentions elsewhere —
    Catalyst gives zero exchange reuse across self-join branches, so an
    unpinned mention frame scans the corpus once per reference."""
    m = mentions if mentions is not None else doc_mentions(docs)
    spark = docs.sparkSession
    pat = spark.createDataFrame(
        WEB_REL_PATTERNS, schema="src_label string, pred string, dst_label string"
    )
    # r6 (guide §2.3 "aggregate before you shuffle"): the per-doc pattern
    # self-join fanned out |docs| x |mentions/doc|^2 rows into the count.
    # n_docs depends only on each doc's MENTION SET, so docs collapse to
    # DISTINCT sets first (with their doc counts) and the pair enumeration
    # runs once per distinct set — identical counts (mentions are distinct
    # per doc, so each doc contributes exactly 1 per qualifying triple,
    # carried by the set's cnt), fan-out |distinct sets| x |set|^2.
    msets = (
        m.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set(F.struct("term", "label"))).alias("ms"))
        .groupBy("ms")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    e1 = msets.select("ms", "cnt", F.explode("ms").alias("s1")).select(
        "ms", "cnt", F.col("s1.term").alias("subj"), F.col("s1.label").alias("s_lbl")
    )
    e2 = e1.select("cnt", "subj", "s_lbl", F.explode("ms").alias("s2")).select(
        "cnt",
        "subj",
        "s_lbl",
        F.col("s2.term").alias("obj"),
        F.col("s2.label").alias("o_lbl"),
    )
    return (
        e2.join(
            F.broadcast(pat),
            (F.col("s_lbl") == F.col("src_label"))
            & (F.col("o_lbl") == F.col("dst_label")),
        )
        .where(F.col("subj") != F.col("obj"))
        .groupBy("subj", "pred", "obj")
        .agg(F.sum("cnt").cast("long").alias("n_docs"))
    )


def cooccur_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Top-k co-mentioned term pairs by doc count (E2 top-k shape:
    TakeOrderedAndProject, no full sort)."""
    m = doc_mentions(docs).select("doc_id", "term")
    l = m.select(F.col("doc_id").alias("d"), F.col("term").alias("term_a"))
    r = m.select(F.col("doc_id").alias("d"), F.col("term").alias("term_b"))
    return (
        l.join(r, "d")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "term_a", "term_b")
        .limit(k)
    )


def khop2(docs: DataFrame, seed: str = "join") -> DataFrame:
    """2-hop neighborhood of a seed term over the co-occurrence triple graph,
    min-hop per node (C8/D8 unrolled to SQL-expressible form)."""
    e = doc_triples(docs).select("subj", "obj")
    # pin the undirected edge set: the plan references it 4x (hop1, hop2's
    # join + anti-join, final union) and Catalyst gets zero ReusedExchange
    # across the union branches — without this the whole mention->triple
    # pipeline recomputes per reference (measured 16 scans, 4.0 s -> 1.3 s
    # at sf0.1). The distinct term-graph edge set is vocabulary-sized, tiny
    # at any corpus scale — same adjacency-pinning rule as the BFS paths.
    und = (
        e.union(e.select(F.col("obj").alias("subj"), F.col("subj").alias("obj")))
        .distinct()
        .localCheckpoint()
    )
    hop1 = (
        und.where(F.col("subj") == seed)
        .select(F.col("obj").alias("node_id"))
        .distinct()
        .where(F.col("node_id") != seed)
    )
    hop2 = (
        und.join(hop1, und.subj == hop1.node_id)
        .select(F.col("obj").alias("node_id"))
        .distinct()
        .where(F.col("node_id") != seed)
        .join(hop1, "node_id", "left_anti")
    )
    return hop1.select("node_id", F.lit(1).alias("hops")).union(
        hop2.select("node_id", F.lit(2).alias("hops"))
    )


def chunk_docs(docs: DataFrame, width: int = 120, step: int = 100) -> DataFrame:
    """Fixed-stride window chunking as pure column expressions (the generic
    engine chunker; the web pipeline's sentence-aware chunker lives in
    operators/chunk.py). (doc_id, chunk_idx, chunk_text, start_char, chunk_id)."""
    n_win = F.greatest(F.ceil(F.length("text") / step).cast("int"), F.lit(1))
    return (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0), n_win - 1)).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(F.col("text"), F.col("chunk_idx") * step + 1, width).alias("chunk_text"),
            (F.col("chunk_idx") * step).alias("start_char"),
            F.substring(
                F.md5(F.concat_ws("::", F.col("doc_id"), F.col("chunk_idx"))), 1, 16
            ).alias("chunk_id"),
        )
    )


def provenance(docs: DataFrame) -> DataFrame:
    """Mentions joined back to their source document metadata (C14 shape)."""
    return doc_mentions(docs).join(
        docs.select("doc_id", "source", "lang", "n_chars"), "doc_id"
    ).select("doc_id", "term", "label", "source", "lang", "n_chars")

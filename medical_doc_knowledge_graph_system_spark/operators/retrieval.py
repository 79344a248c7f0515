"""Graph-RAG retrieval engine: the reference's POST /query lifecycle
(SURVEY §3.2) re-expressed over the materialized warehouse tables.

Stages (reference app/retrieval/context_builder.py:62-158):
  B11 complexity classification  -> adaptive hops / top_k / caps
  E1+C7 entity-first retrieval   -> cosine top-k chunks ⋈ SOURCED_FROM ⋈ nodes
  C8 k-hop expansion             -> iterated joins (operators/graph_queries.py)
  C9 relationship-constrained    -> same with rel-type filter pushed into steps
  C13 reasoning paths (complex)  -> BFS to Condition/Medication/Procedure
  C14 citations                  -> provenance 3-way join over seed ∪ nbr ids
  E3-E6 rerank                   -> score/filter/sort/cap per element class
  B12 prompt formatting          -> driver-side, caps 15/10/5

The engine's contract ends at the ranked, deduplicated, provenance-joined
ContextBundle — exactly what the reference computes before prompting the LLM
(LLM calls are out of scope, SURVEY non-goals).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corelib.similarity import cosine, embed_name

from .graph_queries import k_hop
from .simquery import cosine_score_col

# reference app/config.py:33-36
RETRIEVAL_TOP_K = 5
RETRIEVAL_SCORE_THRESHOLD = 0.35
RERANK_THRESHOLD = 0.25

# Hard cap on neighborhood edges pulled to the driver per bundle — matches the
# reference's largest retrieval-stage LIMIT (k_hop_expansion.py:47).
MAX_BUNDLE_EDGES = 100
# Hard cap on neighborhood nodes pulled to the driver per bundle: the union of
# the two k_hop expansions can't exceed their limits (100 + 50), but the bound
# is enforced EXPLICITLY at the collect boundary rather than implied by
# upstream limits (reference per-stage caps: k_hop_expansion.py:47 LIMIT 100,
# relationship_filter.py:46 LIMIT 50).
MAX_BUNDLE_NODES = 150

# reference app/retrieval/context_builder.py:40-45
_COMPLEX_KEYWORDS = {
    "how", "why", "relate", "relationship", "explain", "connection",
    "between", "compare", "conditions", "medications", "treatment",
    "chain", "path", "multiple", "risk factors",
}

# the 8 clinically-relevant edge types (relationship_filter.py:19-23)
CLINICAL_REL_TYPES = [
    "HAS_CONDITION", "TREATED_WITH", "MANIFESTS_AS", "TAKES_MEDICATION",
    "EXHIBITS_SYMPTOM", "HAS_RISK_FACTOR", "HAS_VITAL", "SCHEDULED_FOR",
]

_PATH_TARGET_LABELS = ["Condition", "Medication", "Procedure"]


def classify_query_complexity(query: str) -> str:
    """Keyword + prefix heuristic (reference context_builder.py:46-59)."""
    lower = query.lower()
    if any(kw in lower for kw in _COMPLEX_KEYWORDS):
        return "complex"
    if lower.startswith(("how ", "why ")):
        return "complex"
    return "simple"


@dataclass
class ContextBundle:
    """Driver-side result bundle (reference app/models/schema.py:130-137)."""

    seed_entities: list = field(default_factory=list)   # rows (node_id, label, name, score)
    neighborhood_nodes: list = field(default_factory=list)  # rows (node_id, label, name, hops)
    neighborhood_edges: list = field(default_factory=list)  # rows (src, dst, rel_type, ...)
    reasoning_paths: list = field(default_factory=list)     # list[list[str]]
    citations: list = field(default_factory=list)       # rows (entity_name, source_text, ...)
    raw_chunks: list = field(default_factory=list)      # list[str]


def entity_first_retrieval(
    query: str,
    chunk_embeddings: DataFrame,
    chunks: DataFrame,
    provenance_edges: DataFrame,
    nodes: DataFrame,
    top_k: int = RETRIEVAL_TOP_K,
    threshold: float = RETRIEVAL_SCORE_THRESHOLD,
) -> tuple[DataFrame, DataFrame]:
    """(seeds, matched_chunks): cosine top-k chunks by query embedding, then
    SOURCED_FROM fan-out to seed entities (reference entity_first.py:22-33;
    score threshold config.py:34). Chunk dedup is first-wins in score order
    (E6, context_builder.py:94-102)."""
    spark = chunk_embeddings.sparkSession
    q_emb = embed_name(query)
    scored = chunk_embeddings.select(
        "chunk_id",
        cosine_score_col(F.col("embedding"), q_emb).alias("score"),
    )
    top_chunks = (
        scored.where(F.col("score") >= threshold)
        .orderBy(F.desc("score"), "chunk_id")
        .limit(top_k)
        .join(chunks.select("chunk_id", "text", "url"), "chunk_id")
    ).localCheckpoint()

    seeds = (
        top_chunks.join(
            provenance_edges.select(
                F.col("dst").alias("chunk_id"), F.col("src").alias("node_id")
            ),
            "chunk_id",
        )
        .join(nodes.select("node_id", "label", "name"), "node_id")
        .groupBy("node_id", "label", "name")
        .agg(F.max("score").alias("score"))
        .orderBy(F.desc("score"), "node_id")
    )
    matched = top_chunks.select("chunk_id", "text", "score").orderBy(
        F.desc("score"), "chunk_id"
    )
    return seeds, matched


def _reasoning_paths(edges: DataFrame, nodes: DataFrame, seed_ids: list[str]) -> list[list[str]]:
    """Seed -> named-target BFS paths, targets limited to 5 Condition /
    Medication / Procedure nodes (reference context_builder.py:297-324 via
    path_reasoning.py:46-59, *..5 LIMIT 5). Returns name/rel chains.

    All seed × target pairs resolve in ONE multi-source BFS (the frontier
    carries seed_id) — ≤ max_hops driver rounds total instead of up to 15
    sequential BFS loops; the kept pairs are the first 5 in the reference's
    seed-major, target-minor iteration order, exactly what the sequential
    version returned."""
    from .graph_queries import multi_source_shortest_paths

    targets = [
        r.node_id
        for r in nodes.where(F.col("label").isin(_PATH_TARGET_LABELS))
        .orderBy(F.desc("n_mentions"), "node_id")
        .limit(5)
        .collect()
    ]
    seeds = seed_ids[:3]
    by_pair = {
        (r.seed_id, r.target_id): r
        for r in multi_source_shortest_paths(edges, seeds, targets, max_hops=5).collect()
    }
    found = []
    for seed in seeds:
        for tgt in targets:
            if tgt == seed or len(found) >= 5:
                continue
            r = by_pair.get((seed, tgt))
            if r is not None:
                found.append(r)
    # resolve only the ids that occur on found paths (never collect the full
    # nodes table — it is web-scale)
    need = sorted({nid for r in found for nid in r.path})
    id2name = {
        r.node_id: r.name
        for r in nodes.where(F.col("node_id").isin(need)).select("node_id", "name").collect()
    }
    paths: list[list[str]] = []
    for r in found:
        chain: list[str] = []
        for i, nid in enumerate(r.path):
            chain.append(id2name.get(nid, nid))
            if i < len(r.rels):
                chain.append(f"-[{r.rels[i]}]-")
        paths.append(chain)
    return paths[:5]


def build_context(
    query: str,
    warehouse: dict[str, DataFrame],
    top_k: int = RETRIEVAL_TOP_K,
    max_hops: int = 3,
) -> ContextBundle:
    """Full retrieval pipeline (reference context_builder.py:62-158).

    warehouse: dict with chunks, chunk_embeddings, nodes, edges,
    provenance_edges DataFrames.
    """
    complexity = classify_query_complexity(query)
    if complexity == "simple":
        hops, eff_k = 1, min(top_k, 3)
    else:
        hops, eff_k = min(max_hops, 2), top_k

    seeds_df, matched_df = entity_first_retrieval(
        query,
        warehouse["chunk_embeddings"],
        warehouse["chunks"],
        warehouse["provenance_edges"],
        warehouse["nodes"],
        top_k=eff_k,
    )
    seeds = seeds_df.collect()
    raw_chunks = [r.text for r in matched_df.collect()]
    if not seeds:
        return ContextBundle(raw_chunks=raw_chunks)
    seed_ids = [s.node_id for s in seeds]
    spark = seeds_df.sparkSession
    seed_frame = spark.createDataFrame([(i,) for i in seed_ids], "node_id string")

    edges, nodes = warehouse["edges"], warehouse["nodes"]
    nbrs = k_hop(edges, seed_frame, max_hops=hops, limit=100)
    rel_nbrs = k_hop(edges, seed_frame, max_hops=3, allowed_rel_types=CLINICAL_REL_TYPES, limit=50)
    # F1: union + id-dedup keeping min hops
    merged_nodes = (
        nbrs.union(rel_nbrs)
        .groupBy("node_id")
        .agg(F.min("hops").alias("hops"))
        .join(nodes.select("node_id", "label", "name"), "node_id")
        .orderBy("hops", "node_id")
        .limit(MAX_BUNDLE_NODES)
    ).collect()

    nbr_ids = {r.node_id for r in merged_nodes} | set(seed_ids)
    id_frame = spark.createDataFrame([(i,) for i in sorted(nbr_ids)], "node_id string")
    # F2: edges touching the kept neighborhood (semi-join each side).
    # Deterministic top-N before collect: a hub node in a web graph can touch
    # millions of edges, and every reference retrieval stage is LIMIT-capped
    # (k_hop_expansion.py:47 LIMIT 100, relationship_filter.py:46 LIMIT 50) —
    # never pull an unbounded edge set to the driver.
    kept_edges = (
        edges.join(id_frame.withColumnRenamed("node_id", "src"), "src", "left_semi")
        .unionByName(
            edges.join(id_frame.withColumnRenamed("node_id", "dst"), "dst", "left_semi").select(
                edges.columns
            )
        )
        .dropDuplicates(["src", "dst", "rel_type"])
        # relevance-ordered cap (highest-confidence edges survive), with a
        # full deterministic tiebreak — NOT name order, which would
        # alphabetically bias the bundle on hub nodes
        .orderBy(F.desc("confidence"), "src", "dst", "rel_type")
        .limit(MAX_BUNDLE_EDGES)
    ).collect()

    paths = (
        _reasoning_paths(edges, nodes, seed_ids) if complexity == "complex" else []
    )

    # C14 citations over seed ∪ neighborhood ids (F3)
    from .graph_queries import provenance_citations

    prov = warehouse["provenance_edges"].join(
        id_frame.withColumnRenamed("node_id", "src"), "src", "left_semi"
    )
    citations = provenance_citations(prov, warehouse["chunks"], limit=25).collect()

    return ContextBundle(
        seed_entities=seeds,
        neighborhood_nodes=merged_nodes,
        neighborhood_edges=kept_edges,
        reasoning_paths=paths,
        citations=citations,
        raw_chunks=raw_chunks,
    )


def _node_text(label: str, name: str) -> str:
    return f"{label} {name}".strip()


def rerank_context_bundle(
    query: str,
    bundle: ContextBundle,
    threshold: float = RERANK_THRESHOLD,
    max_seeds: int = 8,
    max_nodes: int = 10,
    max_citations: int = 10,
    max_paths: int = 5,
) -> ContextBundle:
    """Semantic rerank: score vs query embedding, threshold-prune, sort desc,
    cap — with tighter caps for simple queries (reference
    context_builder.py:164-278; thresholds config.py:36). The bundle is
    driver-sized (≤ ~100 rows) post-retrieval, so scoring runs in-process
    with the same embedding function the executors use."""
    complexity = classify_query_complexity(query)
    if complexity == "simple":
        max_seeds, max_nodes, max_citations, max_paths = (
            min(max_seeds, 3), min(max_nodes, 3), min(max_citations, 3), 0,
        )
        threshold = max(threshold, 0.35)
    else:
        max_seeds, max_nodes, max_citations = (
            min(max_seeds, 6), min(max_nodes, 8), min(max_citations, 8),
        )

    q = embed_name(query)

    def _score(text: str) -> float:
        return cosine(q, embed_name(text))

    seeds = sorted(
        (
            (s, _score(_node_text(s.label, s.name)))
            for s in bundle.seed_entities
        ),
        key=lambda t: -t[1],
    )
    seeds = [s for s, sc in seeds if sc >= threshold][:max_seeds]

    nodes = sorted(
        ((n, _score(_node_text(n.label, n.name))) for n in bundle.neighborhood_nodes),
        key=lambda t: -t[1],
    )
    nodes = [n for n, sc in nodes if sc >= threshold][:max_nodes]

    kept_ids = {s.node_id for s in seeds} | {n.node_id for n in nodes}
    edges = [
        e for e in bundle.neighborhood_edges if e.src in kept_ids or e.dst in kept_ids
    ][:max_nodes]

    citations = sorted(
        (
            (c, _score(f"{c.entity_name} {c.source_text[:100]}"))
            for c in bundle.citations
        ),
        key=lambda t: -t[1],
    )
    citations = [c for c, sc in citations if sc >= threshold][:max_citations]

    relevant = {s.name.lower() for s in seeds} | {n.name.lower() for n in nodes}
    paths = [
        p
        for p in bundle.reasoning_paths
        if {x.lower() for x in p if not x.startswith("-[")} & relevant
    ][:max_paths]

    return ContextBundle(
        seed_entities=seeds,
        neighborhood_nodes=nodes,
        neighborhood_edges=edges,
        reasoning_paths=paths,
        citations=citations,
        raw_chunks=bundle.raw_chunks,
    )


def format_context_for_prompt(bundle: ContextBundle) -> str:
    """Sectioned prompt text with the reference's caps (B12,
    context_builder.py:330-400: entities[:15], edges[:10], citations[:10],
    paths[:5])."""
    out: list[str] = []
    if bundle.seed_entities or bundle.neighborhood_nodes:
        out.append("## Entities")
        ents = list(bundle.seed_entities) + list(bundle.neighborhood_nodes)
        seen: set[str] = set()
        for e in ents:
            if e.node_id in seen:
                continue
            seen.add(e.node_id)
            out.append(f"- ({e.label}) {e.name}")
            if len(seen) >= 15:
                break
    if bundle.neighborhood_edges:
        out.append("## Relationships")
        for e in bundle.neighborhood_edges[:10]:
            out.append(f"- {e.subj} -[{e.rel_type}]-> {e.obj}")
    if bundle.reasoning_paths:
        out.append("## Reasoning paths")
        for p in bundle.reasoning_paths[:5]:
            out.append("- " + " ".join(p))
    if bundle.citations:
        out.append("## Citations")
        for c in bundle.citations[:10]:
            out.append(f"- {c.entity_name} ({c.extraction_method}, conf {c.confidence:.2f}): {c.source_text[:120]}")
    if bundle.raw_chunks:
        out.append("## Source chunks")
        for t in bundle.raw_chunks[:5]:
            out.append(f"- {t[:200]}")
    return "\n".join(out)

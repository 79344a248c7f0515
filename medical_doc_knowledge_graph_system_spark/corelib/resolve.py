"""Entity resolution semantics, shared by the oracle and the Spark stage.

Reference semantics (app/ingestion/entity_resolver.py:102-143):
  pass 0  alias dictionary, first-wins over fuzzy      (:111-114)
  pass 1  fuzzy token_sort_ratio >= 88 all-pairs        (:116-125)
  pass 2  embedding cosine >= 0.85 over pass-1
          canonicals, transitive closure by remap       (:127-143)
  canonical choice: longer name wins                    (:123,137)

Deviations (documented, deterministic):
  * all-pairs loops -> MinHash-LSH / SimHash-LSH blocked candidate pairs
    (identical blocking in oracle and Spark, so zero drift);
  * transitive closure -> connected components (the reference's repeated
    remap at :139-141 IS union-find semantics);
  * "longer wins" is order-dependent on ties -> total order
    (length desc, name asc)  [SURVEY §7.3.3].
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable

from .gazetteer import ALIASES
from .similarity import (
    MAX_LSH_BUCKET,
    fuzzy_match,
    minhash_band_keys,
    semantic_match,
    simhash_band_keys,
)


def alias_canonical(name: str) -> str:
    """Pass 0: broadcast alias dictionary lookup (entity_resolver.py:111-114)."""
    return ALIASES.get(name.lower().strip(), name)


def canonical_choice(names: Iterable[str]) -> str:
    """Deterministic 'longer name wins' with (length desc, name asc) tiebreak."""
    return max(names, key=lambda n: (len(n), [-ord(c) for c in n]))


def candidate_pairs(
    names: list[str], band_fn=minhash_band_keys, max_bucket: int = MAX_LSH_BUCKET
) -> list[tuple[str, str]]:
    """LSH-blocked candidate pairs: names sharing any band key.

    Buckets larger than max_bucket are skipped (non-discriminative band —
    see similarity.MAX_LSH_BUCKET); identical logic in the Spark stage.
    """
    buckets: dict[str, list[str]] = defaultdict(list)
    for n in names:
        for key in band_fn(n):
            buckets[key].append(n)
    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        if len(ms) < 2 or len(ms) > max_bucket:
            continue
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                pairs.add((a, b))
    return sorted(pairs)


def _components(names: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find -> {name: component canonical} (canonical_choice per comp)."""
    parent: dict[str, str] = {n: n for n in names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[str, list[str]] = defaultdict(list)
    for n in names:
        comps[find(n)].append(n)
    out: dict[str, str] = {}
    for members in comps.values():
        c = canonical_choice(members)
        for m in members:
            out[m] = c
    return out


def build_name_map(names: Iterable[str]) -> dict[str, str]:
    """Full three-stage canonical map for a set of distinct entity names."""
    uniq = sorted(set(names))
    m0 = {n: alias_canonical(n) for n in uniq}

    stage1_names = sorted(set(m0.values()))
    fuzzy_edges = [
        (a, b) for a, b in candidate_pairs(stage1_names, minhash_band_keys) if fuzzy_match(a, b)
    ]
    m1 = _components(stage1_names, fuzzy_edges)

    stage2_names = sorted(set(m1.values()))
    sem_edges = [
        (a, b)
        for a, b in candidate_pairs(stage2_names, simhash_band_keys)
        if semantic_match(a, b)
    ]
    m2 = _components(stage2_names, sem_edges)

    return {n: m2[m1[m0[n]]] for n in uniq}

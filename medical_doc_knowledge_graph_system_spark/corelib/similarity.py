"""Deterministic similarity primitives shared by oracle and Spark UDFs.

No Spark imports. Everything here is seeded/deterministic so the Spark
pipeline and the single-process oracle compute identical candidate pairs,
identical merge decisions, and therefore identical canonical maps.

  * token_sort_ratio      — stdlib difflib stand-in for rapidfuzz's
                            token_sort_ratio (reference:
                            app/ingestion/entity_resolver.py:120; threshold 88
                            at :43). Same shape: sort tokens, normalized
                            indel-style ratio * 100.
  * char n-gram shingles  — blocking features for MinHash-LSH.
  * MinHash + band keys   — LSH blocking replacing the reference's O(n²)
                            all-pairs fuzzy loop (entity_resolver.py:116-125).
  * hashed embedding      — deterministic char-3-gram feature hashing,
                            L2-normalized (stand-in for MiniLM, see SURVEY
                            §7.3.5; semantics tested are "cosine >= 0.85 =>
                            merge" per entity_resolver.py:44,127-143).
  * SimHash band keys     — hyperplane LSH blocking for the semantic pass.
"""

from __future__ import annotations

import difflib
import hashlib
import math
import struct
from functools import lru_cache

FUZZY_THRESHOLD = 88.0      # reference: entity_resolver.py:43
SEMANTIC_THRESHOLD = 0.85   # reference: entity_resolver.py:44

MINHASH_K = 16              # minhash functions
MINHASH_BAND_ROWS = 2       # rows per band -> 8 bands
EMBED_DIM = 64
SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8       # -> 4 bands of 256 buckets each

# LSH bucket cap: a band bucket larger than this is non-discriminative
# (template words shared by thousands of names); its pairs are dropped.
# Genuinely similar pairs share several independent bands, so recall loss is
# negligible while candidate count stays near-linear. Shared by the oracle
# and the Spark stage — parity by construction.
MAX_LSH_BUCKET = 32


def _md5_int(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


# -- fuzzy ----------------------------------------------------------------------


def token_sort_key(name: str) -> str:
    return " ".join(sorted(name.lower().split()))


def token_sort_ratio(a: str, b: str) -> float:
    """Sorted-token similarity in [0, 100].

    SequenceMatcher.ratio() is not argument-symmetric (b-side junk
    heuristics), so the two keys are compared in sorted order — making the
    function a true symmetric similarity regardless of call order.
    """
    sa, sb = sorted((token_sort_key(a), token_sort_key(b)))
    if not sa and not sb:
        return 100.0
    return 100.0 * difflib.SequenceMatcher(None, sa, sb).ratio()


def fuzzy_match(a: str, b: str) -> bool:
    return token_sort_ratio(a, b) >= FUZZY_THRESHOLD


# -- shingles + MinHash-LSH ------------------------------------------------------


def char_ngrams(name: str, n: int = 3) -> list[str]:
    s = f" {name.lower().strip()} "
    if len(s) < n:
        return [s]
    return sorted({s[i : i + n] for i in range(len(s) - n + 1)})


def minhash_signature(grams: list[str], k: int = MINHASH_K) -> list[int]:
    if not grams:
        return [0] * k
    return [min(_md5_int(f"{i}|{g}") for g in grams) for i in range(k)]


def minhash_band_keys(name: str) -> list[str]:
    """LSH band keys; two names sharing any key become a candidate pair."""
    sig = minhash_signature(char_ngrams(name))
    r = MINHASH_BAND_ROWS
    return [
        f"b{b}:" + ":".join(str(v) for v in sig[b * r : (b + 1) * r])
        for b in range(MINHASH_K // r)
    ]


# -- deterministic embedding + cosine --------------------------------------------


_GRAM_CACHE: dict[str, tuple[int, float]] = {}
_GRAM_CACHE_MAX = 2_000_000  # bound worker memory on open-vocabulary corpora


def _gram_feature(g: str, dim: int) -> tuple[int, float]:
    key = g if dim == EMBED_DIM else (g, dim)
    hit = _GRAM_CACHE.get(key)
    if hit is None:
        h = _md5_int("emb|" + g)
        hit = (h % dim, 1.0 if (h >> 32) & 1 else -1.0)
        if len(_GRAM_CACHE) >= _GRAM_CACHE_MAX:
            _GRAM_CACHE.clear()
        _GRAM_CACHE[key] = hit
    return hit


def embed_name(name: str, dim: int = EMBED_DIM) -> list[float]:
    """Char-3-gram feature hashing, signed, L2-normalized. Gram features are
    memoized — corpora have far fewer distinct grams than gram occurrences,
    so the md5 runs once per distinct gram per worker."""
    vec = [0.0] * dim
    for g in char_ngrams(name):
        idx, sign = _gram_feature(g, dim)
        vec[idx] += sign
    norm = math.sqrt(sum(v * v for v in vec))
    if norm == 0.0:
        return vec
    return [v / norm for v in vec]


def cosine(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb + 1e-10)  # reference formula: app/rag/embeddings.py:57-61


def semantic_match(a: str, b: str) -> bool:
    return cosine(embed_name(a), embed_name(b)) >= SEMANTIC_THRESHOLD


# -- SimHash blocking for the semantic pass ---------------------------------------


@lru_cache(maxsize=1)
def _hyperplanes(bits: int = SIMHASH_BITS, dim: int = EMBED_DIM) -> list[list[float]]:
    planes = []
    for j in range(bits):
        row = []
        for d in range(dim):
            h = _md5_int(f"plane|{j}|{d}")
            # uniform in [-1, 1)
            row.append((h / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def simhash_bits(vec: list[float]) -> int:
    bits = 0
    for j, plane in enumerate(_hyperplanes()):
        if sum(p * v for p, v in zip(plane, vec)) >= 0.0:
            bits |= 1 << j
    return bits


def simhash_band_keys(name: str) -> list[str]:
    bits = simhash_bits(embed_name(name))
    keys = []
    nb = SIMHASH_BAND_BITS
    for b in range(SIMHASH_BITS // nb):
        band = (bits >> (b * nb)) & ((1 << nb) - 1)
        keys.append(f"s{b}:{band}")
    return keys

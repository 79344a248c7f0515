"""Deterministic mention + relation extraction (pure Python, no Spark).

Replaces the reference's per-chunk Claude tool_use call
(reference: app/ingestion/extractor.py:138-180) with gazetteer mention
detection (token-boundary, longest-match-first, case-insensitive, with
abbreviation expansion per the prompt rule table extractor.py:122-128) and
label-pattern relation emission over the 8 extractable relationship types.

Imported by the mapInPandas extractor UDF AND by the oracle/test harness —
one implementation, zero drift, so triple P/R vs the oracle is structural.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .gazetteer import REL_PATTERNS, surface_forms


def _trie_pattern(words: list[str]) -> str:
    """Trie-compressed alternation preserving longest-match-at-position.

    Python `re` alternation is O(alternatives) per position; a character
    trie shares prefixes so the scan cost is O(match length). Greedy
    `(?:...)?` suffixes at terminal nodes make the engine try the longer
    continuation first, reproducing longest-first alternation exactly.
    """
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}  # terminal marker

    def render(node: dict) -> str:
        term = "" in node
        children = {k: v for k, v in node.items() if k != ""}
        if not children:
            return ""
        alts = [re.escape(ch) + render(sub) for ch, sub in sorted(children.items())]
        body = alts[0] if len(alts) == 1 and not term else "(?:" + "|".join(alts) + ")"
        return body + ("?" if term else "")

    return render(trie)


@lru_cache(maxsize=1)
def _compiled() -> tuple[re.Pattern, dict[str, tuple[str, str, float]]]:
    forms = surface_forms()
    # trie alternation: "nitroglycerin sl" still beats "nitroglycerin" and
    # "heart attack" beats any shorter form at the same position.
    pat = re.compile(
        r"(?<![A-Za-z0-9])(" + _trie_pattern(sorted(forms)) + r")(?![A-Za-z0-9])",
        re.IGNORECASE,
    )
    return pat, forms


def extract_mentions(chunk_text: str, open_vocab: bool = False) -> list[dict]:
    """[{name, label, confidence, start_char, method}] — deterministic scan.

    Non-overlapping longest-first matches at token boundaries (the trie
    pattern above); names are the canonical gazetteer forms for direct hits
    and the raw surface for alias hits — abbreviation expansion is the
    resolver's broadcast alias join (reference pass 0,
    entity_resolver.py:111-114; alias set from the prompt rule table,
    extractor.py:43,122-128).

    With open_vocab=True, corelib.ner's capitalized-span channel runs too
    (the reference's LLM can emit any name, extractor.py:138-180); the
    gazetteer wins on span overlap — a dictionary hit is higher-precision
    than a heuristic candidate covering the same characters.
    """
    pat, forms = _compiled()
    out: list[dict] = []
    spans: list[tuple[int, int]] = []
    for m in pat.finditer(chunk_text):
        surface = m.group(1)
        canonical, label, conf = forms[surface.lower()]
        name = canonical if surface.lower() == canonical.lower() else surface
        out.append(
            {
                "name": name,
                "label": label,
                "confidence": conf,
                "start_char": m.start(),
                "method": "gazetteer",
            }
        )
        spans.append((m.start(), m.end()))
    if open_vocab:
        from .ner import extract_open_mentions

        for om in extract_open_mentions(chunk_text):
            o_start = om["start_char"]
            o_end = o_start + len(om["name"])
            if any(o_start < e and s < o_end for s, e in spans):
                continue
            out.append({**om, "method": "open_ner"})
        out.sort(key=lambda m: (m["start_char"], m["name"]))
    return out


def extract_triples(mentions: list[dict]) -> list[dict]:
    """[(subj, subj_label, pred, obj, obj_label, confidence)] from one chunk's
    mentions.

    For each of the 8 (src_label, rel, dst_label) patterns, emit a triple for
    every (src, dst) mention pair co-occurring in the chunk, deduplicated on
    (subj, pred, obj) keeping max confidence (the reference analog: one LLM
    emission per clinically-linked pair, extractor.py:93-100; within-chunk
    max-confidence dedup per entity_resolver.py:71-82).
    """
    by_label: dict[str, list[dict]] = {}
    for m in mentions:
        by_label.setdefault(m["label"], []).append(m)

    best: dict[tuple[str, str, str], dict] = {}
    for src_label, rel, dst_label in REL_PATTERNS:
        for s in by_label.get(src_label, ()):
            for o in by_label.get(dst_label, ()):
                if s["name"] == o["name"]:
                    continue
                key = (s["name"], rel, o["name"])
                conf = min(s["confidence"], o["confidence"])
                prev = best.get(key)
                if prev is None or conf > prev["confidence"]:
                    best[key] = {
                        "subj": s["name"],
                        "subj_label": src_label,
                        "pred": rel,
                        "obj": o["name"],
                        "obj_label": dst_label,
                        "confidence": conf,
                    }
    return [best[k] for k in sorted(best)]


def extract_chunk(
    chunk_id: str, url: str, chunk_text: str, open_vocab: bool = False
) -> tuple[list[dict], list[dict]]:
    """(mentions, triples) for one chunk, rows carrying provenance keys.

    Mentions are deduplicated on (name, label) keeping max confidence within
    the chunk (reference: entity_resolver.py:71-82 applies this per chunk).
    """
    raw = extract_mentions(chunk_text, open_vocab=open_vocab)
    best_m: dict[tuple[str, str], dict] = {}
    for m in raw:
        key = (m["name"], m["label"])
        prev = best_m.get(key)
        if prev is None or m["confidence"] > prev["confidence"]:
            best_m[key] = m
    mentions = [
        {
            "name": m["name"],
            "label": m["label"],
            "confidence": m["confidence"],
            "start_char": m["start_char"],
            "chunk_id": chunk_id,
            "url": url,
            "method": m["method"],
        }
        for m in (best_m[k] for k in sorted(best_m))
    ]
    triples = [
        {**t, "chunk_id": chunk_id, "url": url} for t in extract_triples(raw)
    ]
    return mentions, triples

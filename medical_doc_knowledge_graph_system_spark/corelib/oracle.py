"""Single-process oracle pipeline: chunk -> extract -> resolve -> triples.

Runs the exact shared corelib functions over a list of page rows in one
Python process. This is the P/R + byte-identity reference for the Spark
pipeline (SURVEY §5.2: oracle = single-process implementation shared with
the UDFs; gate P >= 0.95 and R >= 0.95 on distinct (subj, pred, obj)).
"""

from __future__ import annotations

from .extract import extract_chunk
from .resolve import build_name_map
from .textproc import chunk_page


def run_pipeline(pages: list[dict], open_vocab: bool = False) -> dict:
    """pages: [{url, text, html(optional bytes)}] -> dict of row lists.

    Returns {"chunks": [...], "mentions": [...], "triples": [...],
    "name_map": {...}} with the same field names the Spark tables use.
    Mentions/triples carry canonical (resolved) names. open_vocab mirrors
    pipeline.run_pipeline's flag (corelib.ner channel on both sides).
    """
    # re-crawled urls: latest crawl wins (same rule as pipeline.run_pipeline;
    # null warc_ts sorts last, like Spark's desc_nulls_last; final tiebreak
    # on md5(html) so two html-only crawls with equal ts pick the same row
    # as the Spark window)
    import datetime as _dt
    import hashlib as _hl

    def _key(p: dict) -> tuple:
        ts = p.get("warc_ts") or _dt.datetime.min
        return (ts, p.get("text") or "", _hl.md5(p.get("html") or b"").hexdigest())

    latest: dict[str, dict] = {}
    for p in pages:
        prev = latest.get(p["url"])
        if prev is None or _key(p) > _key(prev):
            latest[p["url"]] = p
    pages = [latest[u] for u in sorted(latest)]

    chunks: list[dict] = []
    for p in pages:
        chunks.extend(chunk_page(p["url"], p.get("text"), p.get("html")))

    mentions: list[dict] = []
    triples: list[dict] = []
    for c in chunks:
        m, t = extract_chunk(c["chunk_id"], c["url"], c["text"], open_vocab=open_vocab)
        mentions.extend(m)
        triples.extend(t)

    names = {m["name"] for m in mentions}
    names |= {t["subj"] for t in triples} | {t["obj"] for t in triples}
    name_map = build_name_map(names)

    # canonical remap (reference: entity_resolver.py:65-68,146-165) +
    # within-chunk (name, label) max-confidence dedup (:71-82)
    best: dict[tuple, dict] = {}
    for m in mentions:
        row = {**m, "name": name_map.get(m["name"], m["name"])}
        key = (row["chunk_id"], row["name"], row["label"])
        prev = best.get(key)
        # deterministic representative: max confidence, then min start_char
        if prev is None or (row["confidence"], -row["start_char"]) > (
            prev["confidence"],
            -prev["start_char"],
        ):
            best[key] = row
    mentions = [best[k] for k in sorted(best)]

    triples = [
        {
            **t,
            "subj": name_map.get(t["subj"], t["subj"]),
            "obj": name_map.get(t["obj"], t["obj"]),
        }
        for t in triples
    ]
    return {
        "chunks": chunks,
        "mentions": mentions,
        "triples": triples,
        "name_map": name_map,
    }


def triple_set(triples: list[dict]) -> set[tuple[str, str, str]]:
    return {(t["subj"], t["pred"], t["obj"]) for t in triples}


def precision_recall(
    got: set[tuple[str, str, str]], want: set[tuple[str, str, str]]
) -> tuple[float, float]:
    """P = |got ∩ want| / |got|, R = |got ∩ want| / |want| (SURVEY §3.3)."""
    if not got or not want:
        return (1.0 if got == want else 0.0,) * 2
    inter = len(got & want)
    return inter / len(got), inter / len(want)

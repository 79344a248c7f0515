"""Deterministic text processing: boilerplate strip + chunking.

Pure Python, no Spark imports. This module is the single source of truth
for chunk semantics: it is imported both by the Arrow-batched pandas UDFs
(operators/chunk.py) and by the single-process oracle used in tests, so the
"byte-identical extracted text per url" invariant holds by construction.

Semantics modeled on the reference chunker
(reference: app/ingestion/chunker.py:34-138):
  * section segmentation  -> for web pages: paragraph segmentation on blank
    lines (the reference's "no headers found -> whole text is one section"
    fallback, chunker.py:88-89, generalized to paragraphs)
  * sliding window max_chars=600 overlap=80 step=max(max-overlap,1),
    offsets tracked (chunker.py:122-138, defaults at :37-38)
  * chunk text is window.strip(); offsets refer to the unstripped window
    (chunker.py:62-67)
  * chunk_id = sha256(f"{doc_id}::{section}::{idx}")[:16]
    (chunker.py:25-28 exactly)
"""

from __future__ import annotations

import hashlib
import html as _html
import re

MAX_CHUNK_CHARS = 600
OVERLAP_CHARS = 80

# -- boilerplate strip ---------------------------------------------------------

_RE_SCRIPT = re.compile(r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.I | re.S)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_BLOCK_TAG = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|blockquote)\b[^>]*>",
    re.I,
)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_HSPACE = re.compile(r"[ \t\r\f\v]+")
_RE_MANY_NL = re.compile(r"\n{3,}")


def strip_boilerplate(html_text: str) -> str:
    """Deterministic HTML -> text extraction (trafilatura-style, simplified).

    Drops script/style/noscript and comments, turns block-level tags into
    newlines, strips remaining tags, unescapes entities, normalizes
    horizontal whitespace, collapses 3+ newlines to 2.
    """
    t = _RE_SCRIPT.sub(" ", html_text)
    t = _RE_COMMENT.sub(" ", t)
    t = _RE_BLOCK_TAG.sub("\n", t)
    t = _RE_TAG.sub(" ", t)
    t = _html.unescape(t)
    t = _RE_HSPACE.sub(" ", t)
    t = "\n".join(line.strip() for line in t.split("\n"))
    t = _RE_MANY_NL.sub("\n\n", t)
    return t.strip()


def page_text(text: str | None, html_bytes: bytes | None) -> str:
    """The extracted text of a page: prefer the `text` column; fall back to
    stripping `html`. Mirrors the input_hint contract (text may be null)."""
    if text is not None and text.strip():
        return text
    if html_bytes:
        return strip_boilerplate(html_bytes.decode("utf-8", errors="replace"))
    return ""


# -- chunking ------------------------------------------------------------------


def make_chunk_id(doc_id: str, section: str, idx: int) -> str:
    """sha256(f"{doc_id}::{section}::{idx}")[:16] — identical formula to the
    reference (app/ingestion/chunker.py:25-28)."""
    raw = f"{doc_id}::{section}::{idx}"
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def split_paragraphs(text: str) -> list[tuple[str, int]]:
    """[(paragraph_text, start_char), ...]; paragraphs split on blank lines.

    Web analogue of the reference's section splitter; a page with no blank
    lines is a single paragraph (reference fallback, chunker.py:88-89).
    """
    paras: list[tuple[str, int]] = []
    pos = 0
    for block in re.split(r"\n\s*\n", text):
        if not block:
            pos += 2
            continue
        start = text.find(block, pos)
        if start < 0:  # defensive; split pieces always exist in text
            start = pos
        paras.append((block, start))
        pos = start + len(block)
    return [(p, s) for p, s in paras if p.strip()]


def sliding_window(
    text: str, max_chars: int = MAX_CHUNK_CHARS, overlap: int = OVERLAP_CHARS
) -> list[tuple[str, int]]:
    """[(window_text, offset)]; reference semantics exactly
    (app/ingestion/chunker.py:122-138)."""
    if len(text) <= max_chars:
        return [(text, 0)]
    windows: list[tuple[str, int]] = []
    step = max(max_chars - overlap, 1)
    pos = 0
    while pos < len(text):
        end = min(pos + max_chars, len(text))
        windows.append((text[pos:end], pos))
        if end == len(text):
            break
        pos += step
    return windows


def chunk_page(
    url: str,
    text: str | None,
    html_bytes: bytes | None = None,
    max_chars: int = MAX_CHUNK_CHARS,
    overlap: int = OVERLAP_CHARS,
) -> list[dict]:
    """Chunk one page into dicts with the `chunks` schema.

    Returns [{chunk_id, url, chunk_idx, text, section, start_char, end_char}].
    Deterministic; global chunk_idx increments across paragraphs in document
    order (reference global_idx, chunker.py:50,71). Empty chunks are dropped
    (reference skips blank-text chunks before extraction, extractor.py:176-177).
    """
    body = page_text(text, html_bytes)
    out: list[dict] = []
    global_idx = 0
    for para, para_start in split_paragraphs(body):
        for win_text, win_off in sliding_window(para, max_chars, overlap):
            stripped = win_text.strip()
            abs_start = para_start + win_off
            if stripped:
                out.append(
                    {
                        "chunk_id": make_chunk_id(url, "BODY", global_idx),
                        "url": url,
                        "chunk_idx": global_idx,
                        "text": stripped,
                        "section": "BODY",
                        "start_char": abs_start,
                        "end_char": abs_start + len(win_text),
                    }
                )
            global_idx += 1
    return out

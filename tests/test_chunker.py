"""Chunker unit tests — ports of the reference's chunker test semantics
(reference tests/test_ingestion.py:55-89: section coverage, unique ids,
non-empty text, offset validity, doc_id retention) to the web chunker."""

from __future__ import annotations

from medical_doc_knowledge_graph_system_spark.corelib.textproc import (
    MAX_CHUNK_CHARS,
    OVERLAP_CHARS,
    chunk_page,
    make_chunk_id,
    page_text,
    sliding_window,
    split_paragraphs,
    strip_boilerplate,
)

LONG = "word " * 400  # 2000 chars -> multiple windows


def test_unique_ids_and_determinism():
    a = chunk_page("https://x/1", LONG)
    b = chunk_page("https://x/1", LONG)
    ids = [c["chunk_id"] for c in a]
    assert len(ids) == len(set(ids)) and ids == [c["chunk_id"] for c in b]
    assert all(len(i) == 16 for i in ids)


def test_chunk_id_formula():
    # sha256(f"{doc_id}::{section}::{idx}")[:16] — reference chunker.py:25-28
    import hashlib

    assert make_chunk_id("u", "BODY", 3) == hashlib.sha256(b"u::BODY::3").hexdigest()[:16]


def test_offsets_valid_and_nonempty():
    text = "para one here.\n\n" + LONG + "\n\nlast para."
    for c in chunk_page("u", text):
        assert c["text"].strip() == c["text"] and c["text"]
        assert 0 <= c["start_char"] < c["end_char"] <= len(text)
        # stripped window is a substring of the original window span
        assert c["text"] in text[c["start_char"] : c["end_char"]]


def test_sliding_window_reference_semantics():
    # max=600 overlap=80 step=520 (reference chunker.py:122-138)
    text = "a" * 1300
    wins = sliding_window(text)
    assert wins[0] == ("a" * 600, 0)
    assert wins[1][1] == MAX_CHUNK_CHARS - OVERLAP_CHARS
    assert wins[-1][0][-1] == "a" and wins[-1][1] + len(wins[-1][0]) == 1300
    assert sliding_window("short") == [("short", 0)]


def test_paragraph_split_offsets():
    text = "first para.\n\nsecond para.\n\n\nthird."
    paras = split_paragraphs(text)
    assert [p for p, _ in paras] == ["first para.", "second para.", "third."]
    for p, s in paras:
        assert text[s : s + len(p)] == p


def test_boilerplate_strip():
    html = (
        "<html><head><script>var x=1;</script><style>.a{}</style></head>"
        "<body><p>Hello &amp; world</p><p>Second</p><!-- c --></body></html>"
    )
    t = strip_boilerplate(html)
    assert "Hello & world" in t and "Second" in t
    assert "var x" not in t and ".a{}" not in t and "c -->" not in t


def test_page_text_fallback():
    assert page_text("direct", b"<p>html</p>") == "direct"
    assert page_text(None, b"<p>html body</p>") == "html body"
    assert page_text("  ", b"<p>x</p>") == "x"
    assert page_text(None, None) == ""


def test_empty_chunks_dropped():
    assert chunk_page("u", "   \n\n   ") == []

"""Property-based tests (hypothesis) for the pure-Python corelib — the
semantics layer both Spark and the oracle share. The reference has no
property tests (SURVEY §5.1); these harden the invariants the distributed
engine relies on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from medical_doc_knowledge_graph_system_spark.corelib.extract import extract_mentions
from medical_doc_knowledge_graph_system_spark.corelib.resolve import build_name_map
from medical_doc_knowledge_graph_system_spark.corelib.similarity import (
    cosine,
    embed_name,
    minhash_signature,
    char_ngrams,
    token_sort_ratio,
)
from medical_doc_knowledge_graph_system_spark.corelib.textproc import (
    chunk_page,
    sliding_window,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=3000
)


@given(text_strategy)
@settings(max_examples=80, deadline=None)
def test_chunk_offsets_always_valid(text):
    for c in chunk_page("u", text):
        assert 0 <= c["start_char"] < c["end_char"] <= len(text)
        assert c["text"] == c["text"].strip() and c["text"]
        assert c["text"] in text[c["start_char"] : c["end_char"]]


@given(text_strategy)
@settings(max_examples=80, deadline=None)
def test_chunking_deterministic(text):
    assert chunk_page("u", text) == chunk_page("u", text)


@given(st.text(max_size=5000), st.integers(1, 500), st.integers(0, 100))
@settings(max_examples=80, deadline=None)
def test_sliding_window_covers_text(text, max_chars, overlap):
    overlap = min(overlap, max_chars - 1) if max_chars > 1 else 0
    wins = sliding_window(text, max_chars, overlap)
    # windows reconstruct the text: each char covered by >= 1 window
    covered = [False] * len(text)
    for w, off in wins:
        assert text[off : off + len(w)] == w
        for i in range(off, off + len(w)):
            covered[i] = True
    assert all(covered) or not text


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_token_sort_ratio_symmetric_bounded(a, b):
    r1, r2 = token_sort_ratio(a, b), token_sort_ratio(b, a)
    assert abs(r1 - r2) < 1e-9
    assert 0.0 <= r1 <= 100.0
    assert token_sort_ratio(a, a) == 100.0


@given(st.text(min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_embedding_normalized_and_self_similar(name):
    e = embed_name(name)
    norm = sum(v * v for v in e)
    assert norm == 0.0 or abs(norm - 1.0) < 1e-9
    if norm > 0:
        assert cosine(e, embed_name(name)) > 0.999


@given(st.text(min_size=1, max_size=80), st.text(min_size=1, max_size=80))
@settings(max_examples=100, deadline=None)
def test_minhash_containment(a, b):
    # identical inputs -> identical signatures; signature is permutation-free
    assert minhash_signature(char_ngrams(a)) == minhash_signature(char_ngrams(a))
    if char_ngrams(a) == char_ngrams(b):
        assert minhash_signature(char_ngrams(a)) == minhash_signature(char_ngrams(b))


@given(st.lists(st.sampled_from(
    ["htn", "Hypertension", "bp", "Blood Pressure", "Aspirin", "asa",
     "heart attack", "Myocardial Infarction", "Acute Myocardial Infarction",
     "Chest Pain", "random name", "Other Thing"]), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_name_map_idempotent_and_closed(names):
    nm = build_name_map(names)
    # every input mapped; canonicals are fixed points of a second resolution
    assert set(nm) == set(names)
    nm2 = build_name_map(set(nm.values()))
    for v in nm.values():
        assert nm2[v] == v  # canonical of a canonical is itself


@given(text_strategy)
@settings(max_examples=60, deadline=None)
def test_mentions_within_bounds(text):
    for m in extract_mentions(text):
        assert 0 <= m["start_char"] < len(text)
        assert 0.0 <= m["confidence"] <= 1.0


@given(st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_trie_pattern_equals_naive_alternation(text):
    """The trie-compressed gazetteer pattern must match exactly like the
    naive longest-first alternation it replaces."""
    import re

    from medical_doc_knowledge_graph_system_spark.corelib.extract import _compiled
    from medical_doc_knowledge_graph_system_spark.corelib.gazetteer import (
        surface_forms,
    )

    forms = surface_forms()
    naive = re.compile(
        r"(?<![A-Za-z0-9])("
        + "|".join(re.escape(a) for a in sorted(forms, key=len, reverse=True))
        + r")(?![A-Za-z0-9])",
        re.IGNORECASE,
    )
    trie, _ = _compiled()
    assert [(m.start(), m.group(1).lower()) for m in trie.finditer(text)] == [
        (m.start(), m.group(1).lower()) for m in naive.finditer(text)
    ]

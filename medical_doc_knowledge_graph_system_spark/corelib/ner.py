"""Open-vocabulary mention extraction (pure Python, no Spark).

The reference's extractor is an LLM and can emit ANY entity name
(reference: app/ingestion/extractor.py:138-180) — the gazetteer engine in
corelib.extract is closed-vocabulary, so on a real web corpus the distinct
name dictionary would stay tiny and the distributed resolution path
(operators.resolve.build_name_map_distributed) would never activate. This
module adds a deterministic open-vocabulary channel:

  candidates   capitalized spans at token boundaries (1-4 title-case words,
               hyphen/space joined); single-token sentence-initial spans are
               kept only when a suffix rule fires (ordinary sentence starts
               are capitalized too — the classic NER ambiguity).
  classifier   three deterministic feature families, first hit wins:
                 1. morphological suffix rules (drug -pril/-statin/…,
                    condition -itis/-osis/…, procedure -oscopy/…);
                 2. left-context trigger phrases ("prescribed X",
                    "diagnosed with X", "underwent X", …);
                 3. hashed char-3-gram prototype match: cosine between the
                    span's feature-hashed embedding (similarity.embed_name)
                    and per-label prototype vectors averaged over the
                    gazetteer — an open-vocabulary generalization of the
                    dictionary, no trained weights.
               Unclassifiable spans are dropped (precision-first, like the
               reference prompt's "omit if unsure" rule extractor.py:117).

Shared by the Spark mapInPandas extractor AND the single-process oracle —
one implementation, zero drift (the corelib invariant).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .gazetteer import GAZETTEER
from .similarity import cosine, embed_name

# confidence by classification channel (deterministic stand-ins for the
# LLM's confidence field, clamped to [0,1] like extractor.py:195)
CONF_SUFFIX = 0.80
CONF_CONTEXT = 0.75
CONF_PROTOTYPE = 0.65

# prototype cosine gate: below this the span is considered junk (filler
# words, navigation text); tuned so title-case lorem-ipsum filler is dropped
# while morphologically medical-looking novel names pass.
PROTOTYPE_THRESHOLD = 0.40

# 1-4 title-case words joined by space or hyphen, at non-alnum boundaries
_CAP_SPAN = re.compile(
    r"(?<![A-Za-z0-9])([A-Z][a-z]+(?:[ -][A-Z][a-z]+){0,3})(?![A-Za-z0-9])"
)

# morphological suffixes, longest-first per label (checked against the last
# word of the span, lowercased)
SUFFIX_RULES: list[tuple[str, str]] = [
    # medications: common INN stems
    ("statin", "Medication"), ("formin", "Medication"), ("sartan", "Medication"),
    ("dipine", "Medication"), ("cillin", "Medication"), ("mycin", "Medication"),
    ("azole", "Medication"), ("olol", "Medication"), ("pril", "Medication"),
    ("parin", "Medication"), ("tide", "Medication"), ("zide", "Medication"),
    # conditions
    ("pathy", "Condition"), ("itis", "Condition"), ("osis", "Condition"),
    ("emia", "Condition"), ("algia", "Condition"), ("oma", "Condition"),
    ("disease", "Condition"), ("syndrome", "Condition"), ("disorder", "Condition"),
    ("failure", "Condition"), ("deficiency", "Condition"),
    # procedures
    ("oscopy", "Procedure"), ("ography", "Procedure"), ("oplasty", "Procedure"),
    ("ectomy", "Procedure"), ("otomy", "Procedure"), ("centesis", "Procedure"),
    ("gram", "Procedure"),
]

# left-context trigger phrases (checked against the text immediately before
# the span, lowercased; longest phrases first so "diagnosed with" beats "with")
CONTEXT_RULES: list[tuple[str, str]] = [
    ("diagnosed with", "Condition"), ("history of", "Condition"),
    ("suffers from", "Condition"), ("suffering from", "Condition"),
    ("prescribed", "Medication"), ("taking", "Medication"),
    ("started on", "Medication"), ("dose of", "Medication"), ("mg of", "Medication"),
    ("underwent", "Procedure"), ("scheduled for", "Procedure"),
    ("complains of", "Symptom"), ("presenting with", "Symptom"),
    ("reports", "Symptom"),
]

# labels eligible for the prototype channel — Patient/Vital/RiskFactor names
# have no open morphology worth generalizing; keeping them dictionary-only
# avoids low-precision junk.
_PROTOTYPE_LABELS = ("Condition", "Symptom", "Medication", "Procedure")


@lru_cache(maxsize=1)
def _label_prototypes() -> list[tuple[str, list[float]]]:
    """Per-label mean of feature-hashed gazetteer-term embeddings (L2 inputs,
    unnormalized mean — cosine is scale-invariant). Deterministic."""
    sums: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    for name, label in sorted(GAZETTEER.items()):
        if label not in _PROTOTYPE_LABELS:
            continue
        vec = embed_name(name)
        acc = sums.setdefault(label, [0.0] * len(vec))
        for i, v in enumerate(vec):
            acc[i] += v
        counts[label] = counts.get(label, 0) + 1
    return [(lab, sums[lab]) for lab in sorted(sums)]


def classify_span(span: str, left_context: str) -> tuple[str, float] | None:
    """(label, confidence) for a candidate span, or None to drop it."""
    last_word = span.rsplit(None, 1)[-1].rsplit("-", 1)[-1].lower()
    for suf, label in SUFFIX_RULES:
        if last_word.endswith(suf) and len(last_word) > len(suf):
            return label, CONF_SUFFIX
    ctx = left_context.lower().rstrip()
    for phrase, label in CONTEXT_RULES:
        if ctx.endswith(phrase):
            return label, CONF_CONTEXT
    vec = embed_name(span)
    best_label, best_cos = None, PROTOTYPE_THRESHOLD
    for label, proto in _label_prototypes():
        c = cosine(vec, proto)
        if c > best_cos:
            best_label, best_cos = label, c
    if best_label is not None:
        return best_label, CONF_PROTOTYPE
    return None


def _sentence_initial(text: str, start: int) -> bool:
    prev = text[:start].rstrip()
    return not prev or prev.endswith((".", "!", "?", ":", ";"))


def extract_open_mentions(chunk_text: str) -> list[dict]:
    """[{name, label, confidence, start_char}] — open-vocabulary channel.

    Candidates overlapping a gazetteer match are NOT filtered here — the
    caller (corelib.extract.extract_chunk) resolves span overlap so both
    channels share one precedence rule.
    """
    out: list[dict] = []
    for m in _CAP_SPAN.finditer(chunk_text):
        span = m.group(1)
        single = " " not in span and "-" not in span
        if single and _sentence_initial(chunk_text, m.start()):
            # sentence-initial single words are capitalized whether or not
            # they are names; only morphology is trustworthy there
            last = span.lower()
            if not any(last.endswith(s) and len(last) > len(s) for s, _ in SUFFIX_RULES):
                continue
        cls = classify_span(span, chunk_text[: m.start()])
        if cls is None:
            continue
        label, conf = cls
        out.append(
            {"name": span, "label": label, "confidence": conf, "start_char": m.start()}
        )
    return out

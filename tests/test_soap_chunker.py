"""SOAP-mode chunker tests — the reference's own chunker test semantics
(reference tests/test_ingestion.py:55-89: section coverage, unique ids,
non-empty text, assessment sub-splitting, doc_id retention, offset
validity), plus the demographics loader (:94-119)."""

from __future__ import annotations

import json
import os

import pytest

from medical_doc_knowledge_graph_system_spark.corelib.soap import (
    chunk_soap_note,
    load_demographics,
    split_assessment_items,
    split_soap_sections,
)

FIXTURE = """Patient: Peter Fern (62M), presented via EMS.

Subjective:
Patient Peter Fern reports substernal chest pain radiating to the left arm, onset 2 hours ago.
Associated SOB and nausea. Hx of HTN and GERD.

Objective:
BP 158/94, HR 102, RR 20, SpO2 96% on room air.
Lungs CTA bilaterally. Heart RRR, no murmurs.

Assessment:
1. Acute coronary syndrome, suspected NSTEMI.
2. Hypertension, poorly controlled.
3. GERD, stable.

Plan:
Aspirin 325mg PO now. Nitroglycerin SL PRN chest pain.
Cardiology consult. Serial troponins and ECG.
"""


def test_sections_detected():
    sections = {s for s, _, _ in split_soap_sections(FIXTURE)}
    assert sections == {"Subjective", "Objective", "Assessment", "Plan"}


def test_no_headers_fallback_subjective():
    out = split_soap_sections("just some text\nwith no headers")
    assert len(out) == 1 and out[0][0] == "Subjective" and out[0][2] == 0


def test_assessment_numbered_split():
    body = next(b for s, b, _ in split_soap_sections(FIXTURE) if s == "Assessment")
    items = split_assessment_items(body, 0)
    assert len(items) == 3
    assert items[0][0].startswith("1.") and items[2][0].startswith("3.")
    single = split_assessment_items("no numbered items here", 10)
    assert single == [("no numbered items here", 10)]


def test_chunks_unique_ids_offsets_nonempty():
    chunks = chunk_soap_note(FIXTURE, "soap_notes.txt")
    assert chunks
    ids = [c["chunk_id"] for c in chunks]
    assert len(ids) == len(set(ids)) and all(len(i) == 16 for i in ids)
    for c in chunks:
        assert c["text"].strip() == c["text"] and c["text"]
        assert 0 <= c["start_char"] < c["end_char"] <= len(FIXTURE)
        assert c["url"] == "soap_notes.txt"
    # assessment items become separate chunks
    assessment = [c for c in chunks if c["section"] == "Assessment"]
    assert len(assessment) == 3


def test_chunking_deterministic():
    assert chunk_soap_note(FIXTURE, "d") == chunk_soap_note(FIXTURE, "d")


def test_demographics_loader():
    raw = json.dumps(
        {
            "patient_number": "P-001",
            "patient_name": "Peter Fern",
            "dob": "1962-03-14",
            "health_card_number": "HC123",
            "phone_home": "555-1",
            "phone_mobile": "555-2",
            "email": "p@example.com",
            "address": {
                "street": "1 Main St",
                "city": "Toronto",
                "province": "ON",
                "postal_code": "M1M1M1",
                "country": "CA",
            },
        }
    )
    chunk, props = load_demographics(raw, "demographics.json")
    assert chunk["section"] == "Demographics" and chunk["text"] == raw
    assert chunk["end_char"] == len(raw) and chunk["chunk_idx"] == 0
    assert props["name"] == "Peter Fern" and props["address_city"] == "Toronto"
    assert props["patient_number"] == "P-001" and props["address_postal"] == "M1M1M1"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/Task_Files/soap_notes.txt"),
    reason="reference inputs not present",
)
def test_reference_task_files_ingest():
    """The reference's actual input files chunk cleanly (migration check)."""
    text = open("/root/reference/Task_Files/soap_notes.txt").read()
    chunks = chunk_soap_note(text, "soap_notes.txt")
    assert chunks and {c["section"] for c in chunks} >= {"Subjective", "Plan"}
    from medical_doc_knowledge_graph_system_spark.corelib.extract import extract_chunk

    triples = []
    for c in chunks:
        _, t = extract_chunk(c["chunk_id"], c["url"], c["text"])
        triples.extend(t)
    assert triples, "reference SOAP note should yield medical triples"

    raw = open("/root/reference/Task_Files/demographics.json").read()
    chunk, props = load_demographics(raw, "demographics.json")
    assert props["name"] and chunk["text"] == raw

"""SOAP-note chunking + demographics flattening — reference-exact semantics.

The generic web pipeline uses corelib.textproc (paragraph segmentation); this
module is the domain-exact mode for users migrating from the reference, whose
inputs are SOAP notes + a demographics JSON
(reference: app/ingestion/chunker.py + Task_Files/). Reimplemented from the
documented behavior (SURVEY §2.B1-B4):

  * four section headers matched at line starts, case-insensitive, optional
    spaces before the colon (chunker.py:17-22);
  * a note with no headers is one SUBJECTIVE section (chunker.py:88-89);
  * section bodies run from the header's colon to the line break preceding
    the next header (chunker.py:91-102);
  * the Assessment section additionally splits on numbered items
    "1. ...", "2. ..." when there are at least two (chunker.py:105-119);
  * sliding window 600/80 within each piece (shared textproc.sliding_window);
  * chunk ids sha256(f"{doc_id}::{section}::{global_idx}")[:16] with a
    global running index (chunker.py:25-28,50,71);
  * chunk text is the stripped window; offsets are absolute into the note.

Demographics: the raw JSON becomes one chunk (section DEMOGRAPHICS, id
index 0) and a flat patient-property dict (chunker.py:144-181).
"""

from __future__ import annotations

import json
import re

from .textproc import make_chunk_id, sliding_window

SOAP_SECTIONS = ["Subjective", "Objective", "Assessment", "Plan"]

_HEADER_RES = [
    (name, re.compile(rf"^{name}\s*:", re.IGNORECASE)) for name in SOAP_SECTIONS
]

_ITEM_RE = re.compile(r"(?:^|\n)\s*(\d+)\.\s+", re.MULTILINE)


def split_soap_sections(text: str) -> list[tuple[str, str, int]]:
    """[(section_name, body, body_start_char)] per the reference's splitter."""
    marks: list[tuple[int, int, str]] = []  # (line_start, body_start, section)
    for m in re.finditer(r"^(.+)$", text, re.MULTILINE):
        for name, pat in _HEADER_RES:
            h = pat.match(m.group(1))
            if h:
                marks.append((m.start(), m.start() + h.end(), name))
                break
    if not marks:
        return [("Subjective", text, 0)]
    out: list[tuple[str, str, int]] = []
    for i, (line_start, body_start, name) in enumerate(marks):
        if i + 1 < len(marks):
            next_line_start = marks[i + 1][0]
            # body ends at the newline before the next header line
            end = text.rfind("\n", 0, next_line_start + 1)
            if end <= body_start:
                end = next_line_start
        else:
            end = len(text)
        out.append((name, text[body_start:end].strip(), body_start))
    return out


def split_assessment_items(body: str, base_offset: int) -> list[tuple[str, int]]:
    """Split on numbered items, keeping offsets; <2 items -> unchanged."""
    matches = list(_ITEM_RE.finditer(body))
    if len(matches) <= 1:
        return [(body, base_offset)]
    items: list[tuple[str, int]] = []
    for i, m in enumerate(matches):
        start = m.start()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(body)
        items.append((body[start:end].strip(), base_offset + start))
    return items


def chunk_soap_note(
    text: str, doc_id: str, max_chars: int = 600, overlap: int = 80
) -> list[dict]:
    """SOAP note -> chunk dicts (same row shape as textproc.chunk_page,
    with SOAP section labels)."""
    out: list[dict] = []
    global_idx = 0
    for section, body, body_start in split_soap_sections(text):
        pieces = (
            split_assessment_items(body, body_start)
            if section == "Assessment"
            else [(body, body_start)]
        )
        for piece, piece_start in pieces:
            for win, off in sliding_window(piece, max_chars, overlap):
                stripped = win.strip()
                if stripped:
                    out.append(
                        {
                            "chunk_id": make_chunk_id(doc_id, section, global_idx),
                            "url": doc_id,
                            "chunk_idx": global_idx,
                            "text": stripped,
                            "section": section,
                            "start_char": piece_start + off,
                            "end_char": piece_start + off + len(win),
                        }
                    )
                global_idx += 1
    return out


def load_demographics(raw_json: str, doc_id: str) -> tuple[dict, dict]:
    """(chunk_row, patient_properties): the whole JSON is one provenance
    chunk; properties flatten name/dob/contact/address fields."""
    data = json.loads(raw_json)
    chunk = {
        "chunk_id": make_chunk_id(doc_id, "Demographics", 0),
        "url": doc_id,
        "chunk_idx": 0,
        "text": raw_json,
        "section": "Demographics",
        "start_char": 0,
        "end_char": len(raw_json),
    }
    address = data.get("address", {})
    props = {
        "patient_number": data.get("patient_number", ""),
        "name": data.get("patient_name", ""),
        "dob": data.get("dob", ""),
        "health_card": data.get("health_card_number", ""),
        "phone_home": data.get("phone_home", ""),
        "phone_mobile": data.get("phone_mobile", ""),
        "email": data.get("email", ""),
        "address_street": address.get("street", ""),
        "address_city": address.get("city", ""),
        "address_province": address.get("province", ""),
        "address_postal": address.get("postal_code", ""),
        "address_country": address.get("country", ""),
    }
    return chunk, props

"""Entity gazetteer, alias dictionary and relation patterns.

The reference extracts with a schema-constrained LLM call
(reference: app/ingestion/extractor.py:26-135): 7 entity labels, an
abbreviation-expansion rule table in the system prompt (:122-128), and 8
extractable relationship types (:93-100, SOURCED_FROM/BELONGS_TO/NEXT
excluded). Our deterministic engine replaces the LLM with dictionary
gazetteer mention detection + the same alias table + label-pattern relation
emission. The alias dictionary is the broadcast-join dimension required by
BASELINE.json; it mirrors MEDICAL_SYNONYMS
(reference: app/ingestion/entity_resolver.py:20-40) plus the prompt's rule
table.
"""

from __future__ import annotations

ENTITY_LABELS = [
    "Patient",
    "Condition",
    "Symptom",
    "Medication",
    "Procedure",
    "Vital",
    "RiskFactor",
]

# 8 extractable relationship types with their (source_label, target_label)
# signatures (reference: app/models/schema.py:34-45 minus the 3 infrastructure
# types; endpoint labels from the Cypher MERGE templates app/graph/queries.py:118-170).
REL_PATTERNS: list[tuple[str, str, str]] = [
    ("Patient", "HAS_CONDITION", "Condition"),
    ("Patient", "EXHIBITS_SYMPTOM", "Symptom"),
    ("Patient", "TAKES_MEDICATION", "Medication"),
    ("Patient", "HAS_VITAL", "Vital"),
    ("Patient", "HAS_RISK_FACTOR", "RiskFactor"),
    ("Patient", "SCHEDULED_FOR", "Procedure"),
    ("Condition", "TREATED_WITH", "Medication"),
    ("Condition", "MANIFESTS_AS", "Symptom"),
]

# canonical name -> label. Includes deliberate near-duplicate variants
# (e.g. "Myocardial Infarction" vs "Acute Myocardial Infarction") so the
# resolution stage (fuzzy + semantic merge) has real work to do, like the
# reference's two-pass resolver (entity_resolver.py:102-143).
GAZETTEER: dict[str, str] = {
    # Patients (synthetic persons seeded by datagen)
    "Peter Fern": "Patient",
    "Maria Velasquez": "Patient",
    "John Smith": "Patient",
    "Aiko Tanaka": "Patient",
    "Omar Haddad": "Patient",
    # Conditions
    "Hypertension": "Condition",
    "Essential Hypertension": "Condition",
    "Myocardial Infarction": "Condition",
    "Acute Myocardial Infarction": "Condition",
    "Gastroesophageal Reflux Disease": "Condition",
    "Type 2 Diabetes": "Condition",
    "Type 2 Diabetes Mellitus": "Condition",
    "Atrial Fibrillation": "Condition",
    "Chronic Kidney Disease": "Condition",
    "Hyperlipidemia": "Condition",
    "Asthma": "Condition",
    # Symptoms
    "Chest Pain": "Symptom",
    "Substernal Chest Pain": "Symptom",
    "Shortness of Breath": "Symptom",
    "Nausea": "Symptom",
    "Dizziness": "Symptom",
    "Palpitations": "Symptom",
    "Fatigue": "Symptom",
    "Lower Extremity Edema": "Symptom",
    "Headache": "Symptom",
    # Medications
    "Nitroglycerin": "Medication",
    "Nitroglycerin Sublingual": "Medication",
    "Aspirin": "Medication",
    "Metformin": "Medication",
    "Lisinopril": "Medication",
    "Atorvastatin": "Medication",
    "Metoprolol": "Medication",
    "Omeprazole": "Medication",
    "Warfarin": "Medication",
    "Albuterol": "Medication",
    # Procedures
    "Electrocardiogram": "Procedure",
    "Echocardiogram": "Procedure",
    "Cardiac Catheterization": "Procedure",
    "Stress Test": "Procedure",
    "Colonoscopy": "Procedure",
    "Follow-up": "Procedure",
    # Vitals
    "Blood Pressure": "Vital",
    "Heart Rate": "Vital",
    "Respiratory Rate": "Vital",
    "Oxygen Saturation": "Vital",
    "Body Temperature": "Vital",
    # Risk factors
    "Smoking": "RiskFactor",
    "Family History": "RiskFactor",
    "Obesity": "RiskFactor",
    "Advanced Age": "RiskFactor",
    "Sedentary Lifestyle": "RiskFactor",
}

# alias (lowercase surface form) -> canonical gazetteer name.
# Superset of the reference's MEDICAL_SYNONYMS (entity_resolver.py:20-40)
# restricted to entries whose canonical form exists in GAZETTEER, plus the
# prompt rule table expansions (extractor.py:122-128).
ALIASES: dict[str, str] = {
    "htn": "Hypertension",
    "high blood pressure": "Hypertension",
    "bp": "Blood Pressure",
    "hr": "Heart Rate",
    "rr": "Respiratory Rate",
    "spo2": "Oxygen Saturation",
    "sob": "Shortness of Breath",
    "mi": "Myocardial Infarction",
    "heart attack": "Myocardial Infarction",
    "gerd": "Gastroesophageal Reflux Disease",
    "acid reflux": "Gastroesophageal Reflux Disease",
    "ecg": "Electrocardiogram",
    "ekg": "Electrocardiogram",
    "le edema": "Lower Extremity Edema",
    "ntg": "Nitroglycerin",
    "nitroglycerin sl": "Nitroglycerin Sublingual",
    "f/u": "Follow-up",
    "afib": "Atrial Fibrillation",
    "a-fib": "Atrial Fibrillation",
    "t2dm": "Type 2 Diabetes Mellitus",
    "dm2": "Type 2 Diabetes",
    "ckd": "Chronic Kidney Disease",
    "echo": "Echocardiogram",
    "cath": "Cardiac Catheterization",
    "asa": "Aspirin",
    "o2 sat": "Oxygen Saturation",
    "temp": "Body Temperature",
    "fhx": "Family History",
}

# confidence by detection method (deterministic stand-in for the LLM's
# confidence field, extractor.py:69-72; clamped to [0,1] like :195).
CONF_DIRECT = 0.95
CONF_ALIAS = 0.85


def surface_forms() -> dict[str, tuple[str, str, float]]:
    """lowercase surface form -> (canonical_name, label, confidence)."""
    forms: dict[str, tuple[str, str, float]] = {}
    for name, label in GAZETTEER.items():
        forms[name.lower()] = (name, label, CONF_DIRECT)
    for alias, canonical in ALIASES.items():
        label = GAZETTEER[canonical]
        # direct names win over aliases on collision (dict order: set last)
        if alias not in forms:
            forms[alias] = (canonical, label, CONF_ALIAS)
    return forms

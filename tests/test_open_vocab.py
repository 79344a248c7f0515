"""Open-vocabulary extraction + distributed resolution gates (VERDICT r01 #3).

The reference's extractor is an LLM that can emit any entity name
(app/ingestion/extractor.py:138-180); corelib.ner is the deterministic
open-vocabulary channel. These tests gate:
  * channel semantics (suffix/context/prototype classification, precision
    filters, gazetteer precedence on span overlap);
  * the fully distributed resolution path over an unbounded name dictionary
    (build_name_map_distributed == corelib.resolve.build_name_map);
  * pipeline e2e parity with open_vocab=True and the driver shortcut
    disabled, P/R >= 0.95 vs the shared-corelib oracle (reference three-stage
    contract, entity_resolver.py:102-143).
"""

from __future__ import annotations

import pytest

from medical_doc_knowledge_graph_system_spark.corelib.extract import extract_chunk
from medical_doc_knowledge_graph_system_spark.corelib.ner import (
    classify_span,
    extract_open_mentions,
)
from medical_doc_knowledge_graph_system_spark.datagen import gen_pages, novel_pool


def test_suffix_classification():
    assert classify_span("Cardvexpril", "") == ("Medication", 0.80)
    assert classify_span("Brunexitis", "") == ("Condition", 0.80)
    assert classify_span("Poldaoscopy", "") == ("Procedure", 0.80)


def test_context_classification():
    got = classify_span("Zorvax", "the patient was diagnosed with ")
    assert got == ("Condition", 0.75)
    got = classify_span("Zorvax", "she was prescribed ")
    assert got == ("Medication", 0.75)


def test_junk_spans_dropped():
    # title-case filler with no medical morphology/context/similarity
    junk = "Lorem ipsum dolor sit amet. Consectetur adipiscing elit."
    assert extract_open_mentions(junk) == []


def test_sentence_initial_single_word_needs_suffix():
    # sentence-initial capitalization is ambiguous; only morphology counts
    assert extract_open_mentions("Treatment was given.") == []
    hits = extract_open_mentions("Cardvexitis was noted.")
    assert [m["name"] for m in hits] == ["Cardvexitis"]


def test_gazetteer_wins_on_overlap():
    m, t = extract_chunk(
        "c1", "u", "Patient has Hypertension and was prescribed Cardvexpril.", open_vocab=True
    )
    by_name = {x["name"]: x for x in m}
    assert by_name["Hypertension"]["method"] == "gazetteer"
    assert by_name["Cardvexpril"]["method"] == "open_ner"
    assert ("Hypertension", "TREATED_WITH", "Cardvexpril") in {
        (x["subj"], x["pred"], x["obj"]) for x in t
    }


def test_closed_vocab_unchanged():
    """open_vocab=False output is byte-identical to the pre-channel engine."""
    text = "Patient has Hypertension and was prescribed Cardvexpril."
    m, _ = extract_chunk("c1", "u", text, open_vocab=False)
    assert [x["name"] for x in m] == ["Hypertension"]
    assert all(x["method"] == "gazetteer" for x in m)


def test_base_variant_pair_merges():
    """datagen's base/variant novel names must merge in stage-1 fuzzy
    resolution (token_sort_ratio >= 88), longer name canonical."""
    from medical_doc_knowledge_graph_system_spark.corelib.resolve import build_name_map

    base, variant = novel_pool(2)  # e.g. Cardcardpril / Cardcardopril
    nm = build_name_map([base, variant])
    assert nm[base] == variant and nm[variant] == variant  # longer wins


def test_distributed_name_map_open_vocab(spark):
    """build_name_map_distributed over an open-vocabulary dictionary equals
    the oracle union-find — the 10^12-doc production path."""
    from medical_doc_knowledge_graph_system_spark.corelib.gazetteer import ALIASES, GAZETTEER
    from medical_doc_knowledge_graph_system_spark.corelib.resolve import build_name_map
    from medical_doc_knowledge_graph_system_spark.operators.resolve import (
        build_name_map_distributed,
    )

    names = sorted(set(novel_pool(200)) | set(GAZETTEER) | set(ALIASES))
    want = build_name_map(names)
    names_df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {r.name: r.canonical for r in build_name_map_distributed(names_df).collect()}
    assert got == want


@pytest.fixture(scope="module")
def ov_pages():
    return gen_pages(40, novel_vocab=120)


@pytest.fixture(scope="module")
def ov_oracle(ov_pages):
    from medical_doc_knowledge_graph_system_spark.corelib.oracle import run_pipeline

    return run_pipeline(ov_pages, open_vocab=True)


@pytest.fixture(scope="module")
def ov_warehouse(spark, ov_pages, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_doc_knowledge_graph_system_spark.pipeline import run_pipeline

    p = tmp_path_factory.mktemp("ov_pages") / "pages.parquet"
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in ov_pages], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in ov_pages], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in ov_pages], pa.binary()),
                "text": pa.array([r["text"] for r in ov_pages], pa.string()),
                "lang": pa.array([r["lang"] for r in ov_pages], pa.string()),
            }
        ),
        str(p),
    )
    root = str(tmp_path_factory.mktemp("ov_wh"))
    # resolve_driver_threshold=0 disables the driver shortcut: the name map
    # is built by the fully distributed LSH + CC path, as it would be at scale
    stats = run_pipeline(
        spark,
        spark.read.parquet(str(p)),
        root,
        open_vocab=True,
        resolve_driver_threshold=0,
    )
    return root, stats


def test_open_vocab_pipeline_parity(spark, ov_warehouse, ov_oracle):
    """E2E: distributed open-vocab pipeline vs shared-corelib oracle.
    Dictionary grows with the corpus; the distributed resolution path runs;
    P/R on distinct triples >= 0.95 (BASELINE gate) — in fact equality."""
    from medical_doc_knowledge_graph_system_spark.corelib.oracle import (
        precision_recall,
        triple_set,
    )

    root, stats = ov_warehouse
    # the dictionary must be genuinely open: well beyond the ~107-entry
    # closed gazetteer+alias vocabulary
    assert stats["name_map"] > 150, stats["name_map"]

    got_nm = {r.name: r.canonical for r in spark.read.parquet(f"{root}/name_map").collect()}
    assert got_nm == ov_oracle["name_map"]

    got = {(r.subj, r.pred, r.obj) for r in spark.read.parquet(f"{root}/triples").collect()}
    want = triple_set(ov_oracle["triples"])
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)

    got_m = {
        (r.chunk_id, r.name, r.label, r.confidence, r.start_char)
        for r in spark.read.parquet(f"{root}/mentions").collect()
    }
    want_m = {
        (m["chunk_id"], m["name"], m["label"], m["confidence"], m["start_char"])
        for m in ov_oracle["mentions"]
    }
    assert got_m == want_m


def test_open_vocab_methods_present(spark, ov_warehouse):
    """Both channels contribute mentions; open_ner names are outside the
    gazetteer."""
    from medical_doc_knowledge_graph_system_spark.corelib.gazetteer import GAZETTEER

    root, _ = ov_warehouse
    methods = {
        r.method: r.name
        for r in spark.read.parquet(f"{root}/mentions_raw")
        .select("method", "name")
        .distinct()
        .collect()
    }
    assert set(methods) == {"gazetteer", "open_ner"}
    open_names = {
        r.name
        for r in spark.read.parquet(f"{root}/mentions_raw")
        .where("method = 'open_ner'")
        .select("name")
        .distinct()
        .collect()
    }
    assert open_names and not (open_names & set(GAZETTEER))

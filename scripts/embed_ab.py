"""A/B: corpus-trained TF-IDF embedding backend vs char-n-gram hash
featurizer on the resolution-merge task (VERDICT r4 #3).

Ground truth = the gazetteer's deliberate variant clusters (corelib
.gazetteer docstring: near-duplicate names the resolution stage exists to
merge); negatives = every other name pair. The merge rule under test is
the reference's 'cosine >= threshold => merge' (entity_resolver.py:44).

Run: python scripts/embed_ab.py [n_pages]   (default 2000 synthetic pages)
Prints one JSON line; numbers recorded in BENCH.md.
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medical_doc_knowledge_graph_system_spark.corelib.gazetteer import GAZETTEER
from medical_doc_knowledge_graph_system_spark.corelib.similarity import (
    SEMANTIC_THRESHOLD,
    cosine,
    embed_name,
)
from medical_doc_knowledge_graph_system_spark.session import get_spark

TRUE_PAIRS = [
    ("Hypertension", "Essential Hypertension"),
    ("Myocardial Infarction", "Acute Myocardial Infarction"),
    ("Type 2 Diabetes", "Type 2 Diabetes Mellitus"),
    ("Chest Pain", "Substernal Chest Pain"),
    ("Nitroglycerin", "Nitroglycerin Sublingual"),
]


def merge_stats(vecs: dict[str, list[float]], threshold: float) -> dict:
    names = sorted(vecs)
    true_set = {tuple(sorted(p)) for p in TRUE_PAIRS}
    neg = [p for p in itertools.combinations(names, 2) if p not in true_set]
    tp = sum(cosine(vecs[a], vecs[b]) >= threshold for a, b in TRUE_PAIRS)
    fp = sum(cosine(vecs[a], vecs[b]) >= threshold for a, b in neg)
    return {
        "recall": tp / len(TRUE_PAIRS),
        "false_merges": fp,
        "n_negative_pairs": len(neg),
    }


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark(app_name="embed_ab", cores=8)

    from medical_doc_knowledge_graph_system_spark.datagen import write_pages_parquet
    from medical_doc_knowledge_graph_system_spark.operators.embed_tfidf import (
        fit_tfidf_embedder,
    )

    with tempfile.TemporaryDirectory() as td:
        pages = os.path.join(td, "pages.parquet")
        write_pages_parquet(pages, n_pages)
        corpus = spark.read.parquet(pages)
        embedder = fit_tfidf_embedder(corpus, "text")
        names = sorted(GAZETTEER)
        vocab = spark.createDataFrame([(n,) for n in names], "text string")
        tfidf = {
            r.text: list(r.embedding)
            for r in embedder.embed(vocab, "text").collect()
        }
    hashed = {n: embed_name(n) for n in names}

    out = {
        "n_pages_fit": n_pages,
        "true_pairs": len(TRUE_PAIRS),
        "pair_cosines": {
            f"{a} | {b}": {
                "hash": round(cosine(hashed[a], hashed[b]), 4),
                "tfidf": round(cosine(tfidf[a], tfidf[b]), 4),
            }
            for a, b in TRUE_PAIRS
        },
    }
    for thr_name, thr in (("at_0.85_reference", SEMANTIC_THRESHOLD), ("at_0.75", 0.75)):
        out[thr_name] = {
            "hash": merge_stats(hashed, thr),
            "tfidf": merge_stats(tfidf, thr),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""DSIR importance weights (functions/curate.py::dsir_weights): python-
oracle equality on a fixed corpus, feature-count arithmetic, and the
directional property the op exists for (target-like docs score higher)."""

from __future__ import annotations

import hashlib
import math

import pytest

from medical_doc_knowledge_graph_system_spark.functions.curate import dsir_weights

pytestmark = pytest.mark.usefixtures("spark")

B = 1024
SCALE = 100000.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _dsir_python(rows):
    """Independent re-implementation: hashed uni+bigram buckets, add-one
    smoothing, floor-quantized log ratios."""

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    def grams(text):
        t = text.strip().lower().split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    dk = {}  # (doc_id, f) -> k
    tgt = {}
    for doc_id, lang, text in rows:
        tgt[doc_id] = lang == "en"
        for g in grams(text):
            dk[(doc_id, bucket(g))] = dk.get((doc_id, bucket(g)), 0) + 1
    cr, ct = {}, {}
    for (doc_id, f), k in dk.items():
        cr[f] = cr.get(f, 0) + k
        if tgt[doc_id]:
            ct[f] = ct.get(f, 0) + k
    c_raw = sum(cr.values())
    c_tgt = sum(ct.values())
    lrq = {
        f: math.floor(
            math.log(((ct.get(f, 0) + 1) * (c_raw + B)) / ((cr[f] + 1) * (c_tgt + B)))
            * SCALE
        )
        for f in cr
    }
    out = {}
    for (doc_id, f), k in dk.items():
        n, w = out.get(doc_id, (0, 0))
        out[doc_id] = (n + k, w + k * lrq[f])
    return {
        d: (n, w, round(w / n / SCALE, 4) + 0.0) for d, (n, w) in out.items()
    }


def test_dsir_matches_python_oracle(spark):
    rows = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the dog sat on the log"),
        (2, "de", "der hund sitzt auf dem baum"),
        (3, "de", "die katze sitzt auf der matte"),
        (4, "en", "the cat and the dog"),
    ]
    got = {
        r.doc_id: (r.n_feat, r.w_q, r.lr_mean)
        for r in dsir_weights(_docs(spark, rows)).collect()
    }
    assert got == _dsir_python(rows)


def test_dsir_feature_count_is_tokens_plus_bigrams(spark):
    rows = [(0, "en", "a b c d"), (1, "de", "x")]
    got = {r.doc_id: r.n_feat for r in dsir_weights(_docs(spark, rows)).collect()}
    assert got == {0: 4 + 3, 1: 1}


def test_dsir_target_like_docs_score_higher(spark):
    # two disjoint vocabularies; the raw pool is mostly German
    rows = (
        [(i, "en", "the quick brown fox jumps") for i in range(5)]
        + [(100 + i, "de", "der schnelle braune fuchs springt") for i in range(15)]
    )
    got = {r.doc_id: r.lr_mean for r in dsir_weights(_docs(spark, rows)).collect()}
    assert min(got[i] for i in range(5)) > max(got[100 + i] for i in range(15))


def test_dsir_custom_target_predicate(spark):
    from pyspark.sql import functions as F

    rows = [(0, "en", "alpha beta"), (1, "zh", "alpha beta"), (2, "zh", "gamma delta")]
    got = {
        r.doc_id: r.lr_mean
        for r in dsir_weights(
            _docs(spark, rows), target=F.col("doc_id") == 2
        ).collect()
    }
    # doc 2's vocabulary IS the target distribution
    assert got[2] > got[0] == got[1]


def _ws_key(doc_id: int, n_tokens: int) -> int:
    h = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:12], 16)
    return math.floor(
        math.log(float(1 << 48) / (h + 1)) / n_tokens * 1000000.0
    )


def test_weighted_sample_python_oracle_equality(spark):
    from medical_doc_knowledge_graph_system_spark.functions.curate import (
        weighted_sample,
    )

    rows = [
        (i, "en", " ".join(f"w{j}" for j in range(1 + (i * 7) % 13)))
        for i in range(60)
    ]
    got = {
        (r.doc_id, r.n_tokens, r.es_key)
        for r in weighted_sample(_docs(spark, rows), n=10).collect()
    }
    keys = sorted(
        (_ws_key(i, 1 + (i * 7) % 13), i, 1 + (i * 7) % 13) for i, _, _ in rows
    )
    expect = {(i, w, k) for k, i, w in keys[:10]}
    assert got == expect


def test_weighted_sample_without_replacement_and_caps(spark):
    from medical_doc_knowledge_graph_system_spark.functions.curate import (
        weighted_sample,
    )

    rows = [(i, "en", "a b c") for i in range(7)]
    out = weighted_sample(_docs(spark, rows), n=100).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == 7 and len(set(ids)) == 7  # every doc once, no more


def test_weighted_sample_favors_heavy_docs(spark):
    from medical_doc_knowledge_graph_system_spark.functions.curate import (
        weighted_sample,
    )

    # one 4000-token doc among 150 one-token docs: its key is ~4000x
    # smaller in expectation -- the deterministic draw picks it
    rows = [(i, "en", "x") for i in range(150)]
    rows.append((999, "en", " ".join("t" for _ in range(4000))))
    out = weighted_sample(_docs(spark, rows), n=5).collect()
    assert 999 in {r.doc_id for r in out}


def test_weighted_sample_partitioning_invariance(spark):
    from medical_doc_knowledge_graph_system_spark.functions.curate import (
        weighted_sample,
    )

    rows = [
        (i, "en", " ".join(f"w{j}" for j in range(1 + i % 9))) for i in range(80)
    ]
    df = _docs(spark, rows)
    a = {tuple(r) for r in weighted_sample(df.repartition(1), n=20).collect()}
    b = {tuple(r) for r in weighted_sample(df.repartition(11), n=20).collect()}
    assert a == b and len(a) == 20

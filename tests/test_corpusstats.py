"""Corpus statistics (functions/corpusstats.py): known-answer n-gram
counts / bigram LM / inverted index, short-doc window policy, posting cap,
determinism across partitionings, top-k plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
    bigram_lm,
    inverted_index,
    ngram_topk,
)

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_ngram_topk_known_answer(spark):
    docs = _docs(spark, ["a b a b", "a b c", "x"])
    got = {(r.ngram, r.c) for r in ngram_topk(docs, n=2, k=10).collect()}
    # "a b a b" -> [a b, b a, a b]; "a b c" -> [a b, b c]; "x" -> none
    assert got == {("a b", 3), ("b a", 1), ("b c", 1)}


def test_ngram_topk_limit_is_deterministic_under_ties(spark):
    docs = _docs(spark, ["a b", "b c", "c d", "d e"])
    got = [(r.ngram, r.c) for r in ngram_topk(docs, n=2, k=2).collect()]
    # all counts tie at 1 -> lexicographic tiebreak picks 'a b', 'b c'
    assert sorted(got) == [("a b", 1), ("b c", 1)]


def test_bigram_lm_probabilities_and_ties(spark):
    # 'the cat' x3, 'the dog' x3 (tie -> 'cat' wins lexicographically),
    # 'a mouse' x1 (below min_count)
    docs = _docs(
        spark,
        ["the cat", "the cat", "the cat", "the dog", "the dog", "the dog",
         "a mouse"],
    )
    rows = {r.w1: r for r in bigram_lm(docs, min_count=2).collect()}
    assert set(rows) == {"the"}
    r = rows["the"]
    assert (r.w2_top, r.c1, r.c12, r.p) == ("cat", 6, 3, 0.5)


def test_inverted_index_df_full_postings_capped(spark):
    # term 'a' in 30 docs; postings capped at 5, df stays 30
    docs = _docs(spark, [f"a w{i}" for i in range(30)])
    rows = {r.term: r for r in inverted_index(docs, max_postings=5).collect()}
    assert rows["a"].df == 30
    assert rows["a"].postings == "0,1,2,3,4"
    assert rows["w7"].df == 1 and rows["w7"].postings == "7"


def test_inverted_index_distinct_within_doc(spark):
    docs = _docs(spark, ["a a a b"])
    rows = {r.term: r for r in inverted_index(docs).collect()}
    assert rows["a"].df == 1  # repeated token counts once per doc


def test_deterministic_across_partitionings(spark):
    docs = _docs(spark, [f"t{i % 7} u{i % 3} common" for i in range(50)])
    a = {tuple(r) for r in inverted_index(docs, max_postings=4).collect()}
    b = {
        tuple(r)
        for r in inverted_index(docs.repartition(13), max_postings=4).collect()
    }
    assert a == b and len(a) > 0


def test_topk_plan_no_global_sort(spark):
    from medical_doc_knowledge_graph_system_spark.plans.checks import (
        physical_plan_string,
    )

    docs = _docs(spark, ["a b c"])
    plan = physical_plan_string(ngram_topk(docs, n=2, k=10))
    assert "TakeOrderedAndProject" in plan


def test_vocab_growth_known_answer(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        vocab_growth,
    )

    docs = _docs(spark, ["a b", "b c", "a b c", "d"])
    got = {r.doc_id: (r.n_new, r.vocab) for r in vocab_growth(docs).collect()}
    # doc0 brings {a,b}=2, doc1 {c}=1, doc2 nothing, doc3 {d}=1
    assert got == {0: (2, 2), 1: (1, 3), 2: (0, 3), 3: (1, 4)}


def test_vocab_growth_bucket_width_invariant(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        vocab_growth,
    )

    docs = _docs(spark, [f"w{i % 11} w{i % 7} x" for i in range(60)])
    a = {tuple(r) for r in vocab_growth(docs, bucket_width=4).collect()}
    b = {tuple(r) for r in vocab_growth(docs, bucket_width=1024).collect()}
    assert a == b and len(a) == 60


def test_doc_lm_scores_known_answer(spark):
    import math

    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        doc_lm_scores,
    )

    # corpus bigrams: (a b) x2, (a c) x1 -> c1(a) = 3
    docs = _docs(spark, ["a b", "a b", "a c", "solo"])
    rows = {r.doc_id: r for r in doc_lm_scores(docs).collect()}
    assert set(rows) == {0, 1, 2}  # 'solo' has no bigrams
    q_ab = math.floor(math.log(3 / 2) * 100000.0)
    q_ac = math.floor(math.log(3 / 1) * 100000.0)
    assert (rows[0].n_bigrams, rows[0].sum_sq) == (1, q_ab)
    assert rows[0].mean_nats == round(q_ab / 100000.0, 4)
    assert (rows[2].n_bigrams, rows[2].sum_sq) == (1, q_ac)
    assert rows[2].mean_nats == round(q_ac / 100000.0, 4)


def test_doc_lm_scores_repeated_bigram_multiplicity(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        doc_lm_scores,
    )

    # 'a a a' contributes bigram (a a) twice POSITIONALLY (k = 2)
    docs = _docs(spark, ["a a a"])
    r = doc_lm_scores(docs).collect()[0]
    # only bigram in corpus -> surprisal ln(2/2) = 0
    assert (r.n_bigrams, r.sum_sq, r.mean_nats) == (2, 0, 0.0)


def test_doc_lm_scores_predictable_text_scores_lower(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        doc_lm_scores,
    )

    # doc 0..8 repeat the same sentence (fully predictable); doc 9 is the
    # lone divergent continuation -> strictly higher mean surprisal
    docs = _docs(spark, ["the cat sat on the mat"] * 9 + ["the cat ate my homework"])
    rows = {r.doc_id: r for r in doc_lm_scores(docs).collect()}
    assert rows[9].mean_nats > rows[0].mean_nats


def test_ppl_buckets_equal_population_and_order(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        doc_lm_scores,
        ppl_buckets,
    )

    # 9 docs with >= 2 tokens -> 3 buckets of 3; ranks are a permutation
    texts = [f"w{i} common tail" for i in range(6)] + [
        "common tail common",
        "common tail x",
        "common common common",
    ]
    docs = _docs(spark, texts)
    out = ppl_buckets(docs, n_buckets=3).collect()
    assert sorted(r.ppl_rank for r in out) == list(range(1, 10))
    from collections import Counter

    assert Counter(r.bucket for r in out) == {1: 3, 2: 3, 3: 3}
    # bucket is monotone in the rank
    for r in out:
        assert r.bucket == (r.ppl_rank - 1) * 3 // 9 + 1
    # rank order == mean surprisal order (doc_id tiebreak)
    lm = {r.doc_id: (r.sum_sq / r.n_bigrams, r.doc_id) for r in doc_lm_scores(docs).collect()}
    ranked = sorted(out, key=lambda r: r.ppl_rank)
    assert [r.doc_id for r in ranked] == sorted(lm, key=lambda d: lm[d])


def test_ppl_buckets_partitioning_invariance(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        ppl_buckets,
    )

    texts = [f"a{i % 4} b{i % 3} c{i % 5} d" for i in range(40)]
    docs = _docs(spark, texts)
    a = {tuple(r) for r in ppl_buckets(docs.repartition(1)).collect()}
    b = {tuple(r) for r in ppl_buckets(docs.repartition(7)).collect()}
    assert a == b and len(a) == 40


def _zipf_python(counts, k=1000):
    """Exact simulation of zipf_slope's quantized regression on a
    {term: count} dict for one group."""
    import math

    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    pts = [
        (
            math.floor(math.log(r) * 1e5),
            math.floor(math.log(c) * 1e5),
        )
        for r, (_, c) in enumerate(head, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = round((float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx), 4)
    return n, sx, sy, sxy, sxx, slope + 0.0


def test_zipf_slope_near_minus_one_and_simulator_equal(spark):
    """A synthetic corpus with counts floor(600/r) is Zipf(1) by
    construction -> fitted slope within a few percent of -1; every moment
    matches the python simulation bit-for-bit."""
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        zipf_slope,
    )

    counts = {f"w{r:03d}": 600 // r for r in range(1, 51)}
    words = []
    for t, c in counts.items():
        words += [t] * c
    # spread across several docs; token order is irrelevant to counts
    docs = spark.createDataFrame(
        [(i, "en", " ".join(words[i::7])) for i in range(7)],
        "doc_id long, lang string, text string",
    )
    out = zipf_slope(docs, k=1000).collect()
    assert len(out) == 1
    r = out[0]
    n, sx, sy, sxy, sxx, slope = _zipf_python(counts)
    assert (r.n_head, r.sx, r.sy, r.sxy, r.sxx) == (n, sx, sy, sxy, sxx)
    assert r.slope == slope
    assert -1.15 < r.slope < -0.85


def test_zipf_slope_head_cap_and_degenerate(spark):
    """k caps the fitted head (n_head == k when vocab exceeds it); a
    single-term group has no regression -> NULL slope."""
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        zipf_slope,
    )

    docs = spark.createDataFrame(
        [
            (0, "en", " ".join(f"t{i}" for i in range(30))),
            (1, "de", "solo solo solo"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.lang: r for r in zipf_slope(docs, k=10).collect()}
    assert out["en"].n_head == 10
    assert out["de"].n_head == 1 and out["de"].slope is None

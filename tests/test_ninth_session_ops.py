"""Ninth-session r5 operators: SymSpell edit-distance blocking
(completeness vs brute-force levenshtein, verify soundness), bipartite
butterfly counting (known answer + brute-force 4-cycle enumeration), and
BM25 top-k (python-reference equality on the quantized scores)."""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.functions.corpusstats import bm25_topk
from medical_doc_knowledge_graph_system_spark.functions.dedup import editdist_pairs
from medical_doc_knowledge_graph_system_spark.operators.graph_analytics import (
    butterflies,
)


# ── edit distance ────────────────────────────────────────────────────────────


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_editdist_pairs_complete_vs_brute_force(spark):
    # substitutions, inserts, deletes, a shared-prefix serial-id family,
    # and strings >1 apart — the blocking must find EXACTLY the <=1 set
    names = [
        "alpha", "alpho",            # substitution
        "beta", "betas",             # insert at end
        "gamma", "gama",             # delete
        "id#001", "id#002", "id#011", "id#101",  # serial ids
        "zeta", "omega",             # unrelated
        "x", "y", "xy",              # short strings ('' variant bucket)
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = sorted(
        (r.name_a, r.name_b, r.dist)
        for r in editdist_pairs(df, "name").collect()
    )
    want = sorted(
        (a, b, _lev(a, b))
        for a, b in combinations(sorted(names), 2)
        if _lev(a, b) <= 1
    )
    assert got == want
    # sanity: the brute-force set is non-trivial in every edit class
    assert ("alpha", "alpho", 1) in want and ("x", "xy", 1) in want


def test_editdist_pairs_dedups_multi_variant_candidates(spark):
    # "aa"/"ab" share TWO deletion variants ('a' from each position on one
    # side, plus themselves); the pair must still appear exactly once
    df = spark.createDataFrame([("aa",), ("ab",)], "name string")
    rows = editdist_pairs(df, "name").collect()
    assert [(r.name_a, r.name_b, r.dist) for r in rows] == [("aa", "ab", 1)]


# ── butterflies ──────────────────────────────────────────────────────────────


def _brute_butterflies(incid):
    left = sorted({d for d, _ in incid})
    nb = {d: {s for dd, s in incid if dd == d} for d in left}
    per = {}
    for d1, d2 in combinations(left, 2):
        c = len(nb[d1] & nb[d2])
        if c >= 2:
            bfly = c * (c - 1) // 2
            for d in (d1, d2):
                cop, tot = per.get(d, (0, 0))
                per[d] = (cop + 1, tot + bfly)
    return sorted((d, c, b) for d, (c, b) in per.items())


def test_butterflies_known_answer_and_brute_force(spark):
    # K_{2,2} on (1,2)x(a,b) = exactly 1 butterfly; doc 3 shares only one
    # shingle with each -> in no butterfly; shingle 'z' is df=1 (dropped
    # by min_df); 'w' has df=4 but stays under max_df
    incid = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"),
        (3, "a"), (3, "z"),
        (1, "w"), (2, "w"), (3, "w"), (4, "w"),
    ]
    df = spark.createDataFrame(incid, "doc_id bigint, shingle string")
    got = sorted(
        (r.doc_id, r.n_copair, r.n_bfly) for r in butterflies(df).collect()
    )
    assert got == _brute_butterflies(incid)
    # docs 1 and 2 share {a, b, w} -> C(3,2)=3 butterflies each from that
    # pair alone; 1-3 and 2-3 share {a, w} -> 1 more each
    assert got == [(1, 2, 4), (2, 2, 4), (3, 2, 2)]


def test_butterflies_df_cap_drops_frequent_shingles(spark):
    # with max_df=2 the df-3 shingle is excluded and no butterfly survives
    incid = [(1, "a"), (2, "a"), (3, "a"), (1, "b"), (2, "b"), (3, "b")]
    df = spark.createDataFrame(incid, "doc_id bigint, shingle string")
    assert butterflies(df, max_df=2).count() == 0
    assert butterflies(df, max_df=3).count() == 3


# ── BM25 ────────────────────────────────────────────────────────────────────


def test_bm25_topk_matches_python_reference(spark):
    docs = [
        (0, "join scan join filter"),
        (1, "join join join join scan"),
        (2, "filter scan"),
        (3, "merge sort spill"),
        (4, "join filter merge scan sort"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    # rank the full (tiny) vocab band so every term is a query term
    got = {
        r.doc_id: (r.n_qterms, r.bm25, r.rk)
        for r in bm25_topk(df, k=5, q_lo=1, q_hi=100).collect()
    }

    toks = {i: t.split(" ") for i, t in docs}
    tf = {i: {w: ts.count(w) for w in set(ts)} for i, ts in toks.items()}
    dfreq: dict[str, int] = {}
    for ts in tf.values():
        for w in ts:
            dfreq[w] = dfreq.get(w, 0) + 1
    n = len(docs)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    want = {}
    for i, ts in tf.items():
        sq = 0
        for w, f in ts.items():
            idf = math.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            s = idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * len(toks[i]) / avgdl))
            sq += math.floor(s * 1000000.0 + 0.5)
        want[i] = (len(ts), round(sq / 1000000.0, 4))
    order = sorted(want, key=lambda i: (-round(want[i][1] * 1e6), i))
    for rk, i in enumerate(order, 1):
        assert got[i] == (want[i][0], want[i][1], rk)


def test_bm25_rarer_term_outranks_common_at_equal_tf(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4; the rare-term doc
    # must outrank the common-term doc of identical length/tf
    docs = [
        (0, "common rare pad pad"),
        (1, "common pad pad pad"),
        (2, "common pad pad pad"),
        (3, "common pad pad pad"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = bm25_topk(df, k=4, q_lo=1, q_hi=100).collect()
    top = min(rows, key=lambda r: r.rk)
    assert top.doc_id == 0 and top.n_qterms == 3


# ── OHLC + Welch ────────────────────────────────────────────────────────────


def test_events_ohlc_known_answer(spark):
    import datetime as dt

    rows = [
        # (event_id, ts, value): one day, deliberately out of order
        (3, dt.datetime(2024, 1, 1, 12, 0), 5.0),
        (1, dt.datetime(2024, 1, 1, 0, 30), 2.0),   # open (earliest ts)
        (2, dt.datetime(2024, 1, 1, 23, 0), 9.0),   # close (latest ts)
        (4, dt.datetime(2024, 1, 1, 12, 0), 1.0),   # low (ties on ts w/ 3)
        # second day, single row: open==close==high==low
        (5, dt.datetime(2024, 1, 2, 8, 0), 7.5),
    ]
    df = spark.createDataFrame(
        [(i, t, 7, "click", v, "{}") for i, t, v in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    import __spark_entry__ as entry

    # queries() closures take (spark, sf_dir); drive the same expression
    # directly on the in-memory frame instead
    F_ = entry.F
    g = df.groupBy("event_type", F_.to_date("ts").alias("day")).agg(
        F_.min(F_.struct("ts", "event_id", "value")).alias("o"),
        F_.max(F_.struct("ts", "event_id", "value")).alias("c"),
        F_.max("value").alias("high"),
        F_.min("value").alias("low"),
        F_.count(F_.lit(1)).cast("long").alias("n"),
    ).select(
        F_.col("day").cast("string").alias("day"),
        F_.col("o.value").alias("open"),
        "high", "low",
        F_.col("c.value").alias("close"),
        "n",
    )
    got = {r.day: (r.open, r.high, r.low, r.close, r.n) for r in g.collect()}
    assert got["2024-01-01"] == (2.0, 9.0, 1.0, 9.0, 4)
    assert got["2024-01-02"] == (7.5, 7.5, 7.5, 7.5, 1)


def test_events_ab_welch_matches_numpy(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.normal(50, 10, 200).clip(0)
    b = rng.normal(55, 20, 150).clip(0)
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "A", float(v), "{}")
        for i, v in enumerate(a)
    ] + [
        (1000 + i, dt.datetime(2024, 1, 1), 1, "B", float(v), "{}")
        for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    import __spark_entry__ as entry

    [r] = entry.queries()["events_ab_welch"](spark, d).collect()
    # independent reference on the SAME quantized cents
    qa = np.floor(a * 100.0 + 0.5)
    qb = np.floor(b * 100.0 + 0.5)
    va, vb = qa.var(ddof=1), qb.var(ddof=1)
    se2 = va / len(qa) + vb / len(qb)
    t = (qa.mean() - qb.mean()) / np.sqrt(se2)
    nu = se2**2 / (
        (va / len(qa)) ** 2 / (len(qa) - 1) + (vb / len(qb)) ** 2 / (len(qb) - 1)
    )
    assert (r.type_a, r.type_b, r.n_a, r.n_b) == ("A", "B", 200, 150)
    assert abs(r.t_welch - t) < 2e-4 and abs(r.df_welch - nu) < 2e-3


# ── chunk dedup ─────────────────────────────────────────────────────────────


def test_chunk_dedup_keeps_first_occurrence_and_reassembles(spark):
    from medical_doc_knowledge_graph_system_spark.functions.dedup import (
        chunk_dedup,
    )

    w = 4  # small width so the fixture stays readable
    boiler = "b1 b2 b3 b4"          # the duplicated chunk
    uniq0 = "a1 a2 a3 a4"
    uniq2 = "c1 c2 c3"              # short tail chunk
    docs = [
        (0, f"{uniq0} {boiler}"),   # first occurrence of boiler (doc 0, idx 1)
        (1, boiler),                # fully duplicated -> new_text ''
        (2, f"{boiler} {uniq2}"),   # boiler dropped, tail kept
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.new_text, r.n_kept, r.n_dropped)
        for r in chunk_dedup(df, width=w).collect()
    }
    assert got[0] == (f"{uniq0} {boiler}", 2, 0)
    assert got[1] == ("", 0, 1)
    assert got[2] == (uniq2, 1, 1)


def test_chunk_dedup_within_doc_repeat(spark):
    from medical_doc_knowledge_graph_system_spark.functions.dedup import (
        chunk_dedup,
    )

    # the same chunk twice INSIDE one doc: second occurrence dropped
    df = spark.createDataFrame(
        [(7, "x1 x2 x1 x2")], "doc_id bigint, text string"
    )
    [r] = chunk_dedup(df, width=2).collect()
    assert (r.new_text, r.n_kept, r.n_dropped) == ("x1 x2", 1, 1)


# ── BPE merges ──────────────────────────────────────────────────────────────


def test_bpe_merges_known_answer_greedy(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        bpe_merges,
    )

    # 'aaab' x3 + 'ab' x2: round 1 pairs — (a,a) n=6 (two per 'aaab'),
    # (a,b) n=5 -> merge (a,a). Round 2 operates on greedy-folded 'aa a b'
    # (NOT 'aa aa ...'): pairs (aa,a) n=3, (a,b) n=5 -> merge (a,b).
    docs = [(0, "aaab aaab aaab ab ab")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [
        (r.round, r.left_tok, r.right_tok, r.n)
        for r in bpe_merges(df, k=2).orderBy("round").collect()
    ]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 5)]


def test_bpe_merges_tie_breaks_lexicographic(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        bpe_merges,
    )

    # 'xy' and 'xz' both n=1: (x,y) < (x,z) lexicographically wins
    df = spark.createDataFrame([(0, "xy xz")], "doc_id bigint, text string")
    [r] = bpe_merges(df, k=1).collect()
    assert (r.left_tok, r.right_tok, r.n) == ("x", "y", 1)


def test_events_wilson_penalizes_small_samples(spark, tmp_path):
    import datetime as dt

    # cohort 0: 1/1 (raw rate 1.0, tiny n); cohort 1: 90/100 — the Wilson
    # LOWER bound must rank the large honest cohort above the 1/1 fluke
    rows = [(0, dt.datetime(2024, 1, 1), 0, "purchase", 1.0, "{}")]
    rows += [
        (100 + i, dt.datetime(2024, 1, 1), 1,
         "purchase" if i < 90 else "view", 1.0, "{}")
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    import __spark_entry__ as entry

    got = {r.cohort: r for r in entry.queries()["events_wilson"](spark, d).collect()}
    assert got[0].n_trials == 1 and got[0].n_buy == 1
    assert got[1].n_trials == 100 and got[1].n_buy == 90
    # bound strictly below the raw rate, and the 90/100 cohort ranks first
    assert got[0].wilson_lb < 1.0 and got[1].wilson_lb < 0.9
    assert got[1].rk == 1 and got[0].rk == 2

"""Fourteenth-session r5 operators: Bollinger bands, Simpson diversity,
Benford first-digit census — numpy/brute-force parity, edge handling, and
scan-budget pins for the new gate queries."""

from __future__ import annotations

import math
import random

import __spark_entry__ as entry
from medical_doc_knowledge_graph_system_spark.plans.checks import (
    physical_plan_string,
)

SF001 = "/root/testdata/sf0.001"


# ── bollinger_bands ──────────────────────────────────────────────────────────


def test_bollinger_matches_pandas_rolling(spark):
    import numpy as np
    import pandas as pd

    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        bollinger_bands,
    )

    rng = random.Random(41)
    ys = [rng.randrange(0, 1000) for _ in range(30)]
    df = spark.createDataFrame(
        [("k", x, y) for x, y in zip(range(30), ys)],
        "k string, day int, n long",
    )
    got = {
        r["day"]: r
        for r in bollinger_bands(df, ["k"], day_col="day").collect()
    }
    s = pd.Series(ys, dtype=float)
    ma = s.rolling(7, min_periods=1).mean()
    sd = s.rolling(7, min_periods=2).std()  # Bessel, like the operator
    assert 0 not in got  # first row dropped (n_obs == 1)
    for x in range(1, 30):
        r = got[x]
        assert r["n_obs"] == min(7, x + 1)
        assert abs(r["ma"] - ma[x]) < 1e-9
        assert abs(r["sd"] - sd[x]) < 1e-9
        assert abs(r["upper"] - (r["ma"] + 2.0 * r["sd"])) < 1e-12
        assert abs(r["lower"] - (r["ma"] - 2.0 * r["sd"])) < 1e-12
    assert np is not None


def test_bollinger_constant_series_zero_band(spark):
    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        bollinger_bands,
    )

    df = spark.createDataFrame(
        [("k", x, 42) for x in range(5)], "k string, day int, n long"
    )
    for r in bollinger_bands(df, ["k"], day_col="day").collect():
        assert r["sd"] == 0.0 and r["upper"] == 42.0 and r["lower"] == 42.0


# ── simpson_diversity ────────────────────────────────────────────────────────


def test_simpson_known_answers(spark):
    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        simpson_diversity,
    )

    rows = (
        # all same item: D = 0
        [("mono", "a")] * 5
        # all distinct: D = 1
        + [("uniq", it) for it in "abcde"]
        # 2+2: D = 1 - (2+2)/(4*3) = 2/3
        + [("half", "a"), ("half", "a"), ("half", "b"), ("half", "b")]
        # single row: dropped (n < 2)
        + [("one", "z")]
    )
    df = spark.createDataFrame(rows, "k string, item string")
    out = {r["k"]: r for r in simpson_diversity(df, ["k"], "item").collect()}
    assert out["mono"]["simpson"] == 0.0 and out["mono"]["n_items"] == 1
    assert out["uniq"]["simpson"] == 1.0 and out["uniq"]["n"] == 5
    assert abs(out["half"]["simpson"] - 2.0 / 3.0) < 1e-12
    assert "one" not in out


def test_simpson_matches_bruteforce_pair_probability(spark):
    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        simpson_diversity,
    )

    rng = random.Random(17)
    items = [rng.choice("abcdefg") for _ in range(200)]
    df = spark.createDataFrame([("g", it) for it in items], "k string, item string")
    got = simpson_diversity(df, ["k"], "item").collect()[0]["simpson"]
    same = sum(
        1
        for i in range(len(items))
        for j in range(len(items))
        if i != j and items[i] == items[j]
    )
    expect = 1.0 - same / (len(items) * (len(items) - 1))
    assert abs(got - expect) < 1e-12


# ── benford_firstdigit ───────────────────────────────────────────────────────


def test_benford_counts_and_chi2_vs_python(spark):
    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        BENFORD_P,
        benford_firstdigit,
    )

    rng = random.Random(5)
    cents = [rng.randrange(1, 10**6) for _ in range(500)]
    df = spark.createDataFrame([(c,) for c in cents], "cents long")
    rows = {r["digit"]: r for r in benford_firstdigit(df, "cents").collect()}
    obs = {d: 0 for d in range(1, 10)}
    for c in cents:
        obs[int(str(c)[0])] += 1
    n = len(cents)
    chi2 = 0
    for d in range(1, 10):
        p = float(BENFORD_P[d])
        e = float(n) * p
        chi2 += math.floor((obs[d] - e) * (obs[d] - e) / e * 1e6 + 0.5)
    chi2 /= 1e6
    for d in range(1, 10):
        assert rows[d]["n_obs"] == obs[d]
        assert abs(rows[d]["expected"] - n * float(BENFORD_P[d])) < 1e-9
        assert abs(rows[d]["chi2"] - chi2) < 1e-9


def test_benford_zero_count_digits_still_contribute(spark):
    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        benford_firstdigit,
    )

    # only digit 1 present; rows < 1 ignored
    df = spark.createDataFrame([(100,), (199,), (0,), (-5,)], "cents long")
    rows = {r["digit"]: r for r in benford_firstdigit(df, "cents").collect()}
    assert len(rows) == 9
    assert rows[1]["n_obs"] == 2
    assert all(rows[d]["n_obs"] == 0 for d in range(2, 10))
    # zero-count digits contribute e to chi2: chi2 >= sum of their e terms
    assert rows[1]["chi2"] > 0


# ── plan pins ────────────────────────────────────────────────────────────────


def test_events_simpson_two_hash_aggregates_one_scan(spark):
    q = entry.queries()
    p = physical_plan_string(q["events_simpson"](spark, SF001))
    assert p.count("Scan parquet") == 1
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_events_bollinger_one_scan_no_global_window(spark):
    """The only window partitions by event_type — never a global sort."""
    q = entry.queries()
    p = physical_plan_string(q["events_bollinger"](spark, SF001))
    assert p.count("Scan parquet") == 1
    assert "CartesianProduct" not in p


def test_events_benford_one_scan(spark):
    """One parquet scan; the 9-row digit dimension is generated, and the
    unpartitioned windows run over exactly 9 rows (by design)."""
    q = entry.queries()
    p = physical_plan_string(q["events_benford"](spark, SF001))
    assert p.count("Scan parquet") == 1


# ── morton_key / zorder_stats ────────────────────────────────────────────────


def _py_morton(x, y, bits=10):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from medical_doc_knowledge_graph_system_spark.operators.layout import (
        morton_key,
    )

    rng = random.Random(3)
    pts = [(rng.randrange(0, 1024), rng.randrange(0, 1024)) for _ in range(100)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"])


def test_zorder_boxes_tighter_than_single_column_sort(spark):
    """The z-order property: file bounding boxes are small in BOTH dims.
    Under an x-sort layout the y-range of every file is full-range; under
    z-order each of the 64 files must cover < 1/2 of the y range."""
    from medical_doc_knowledge_graph_system_spark.operators.layout import (
        zorder_stats,
    )

    rng = random.Random(9)
    pts = [(rng.randrange(0, 1024), rng.randrange(0, 1024)) for _ in range(20000)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = zorder_stats(df, "x", "y", bits=10, n_files=64).collect()
    assert sum(r["n_rows"] for r in rows) == 20000
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 512
        assert r["max_y"] - r["min_y"] <= 512


def test_zorder_rejects_non_divisor_file_count(spark):
    import pytest

    from medical_doc_knowledge_graph_system_spark.operators.layout import (
        zorder_stats,
    )

    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_stats(df, "x", "y", bits=10, n_files=3)


# ── kneser_ney_bigram ────────────────────────────────────────────────────────


def test_kneser_ney_matches_direct_python(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        kneser_ney_bigram,
    )

    docs = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigram(df, k=50).collect()
    }
    # direct python KN with D = 0.75
    pairs = []
    for t in docs:
        ws = t.split(" ")
        pairs += list(zip(ws, ws[1:]))
    from collections import Counter

    c12 = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    n1fwd = Counter(w1 for w1, _ in set(pairs))
    ncont = Counter(w2 for _, w2 in set(pairs))
    T = len(set(pairs))
    for (w1, w2), c in c12.items():
        expect = (c - 0.75) / c1[w1] + 0.75 * n1fwd[w1] / c1[w1] * (
            ncont[w2] / T
        )
        r = got[(w1, w2)]
        assert r["c12"] == c and r["c1"] == c1[w1]
        assert r["n1fwd"] == n1fwd[w1] and r["ncont"] == ncont[w2]
        assert r["n_types"] == T
        assert abs(r["p_kn"] - expect) < 1e-9


def test_kneser_ney_discount_reserves_mass(spark):
    """For every observed bigram, p_KN < p_ML (the discount reserves mass
    for the continuation back-off) and p_KN > 0."""
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        kneser_ney_bigram,
    )

    df = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "b c b a")], "doc_id long, text string"
    )
    for r in kneser_ney_bigram(df, k=50).collect():
        p_ml = r["c12"] / r["c1"]
        assert 0.0 < r["p_kn"] < p_ml + 0.75 * r["n1fwd"] / r["c1"]


# ── stream_funnel ────────────────────────────────────────────────────────────


def test_stream_funnel_equals_batch_funnel(spark):
    q = entry.queries()
    batch = {
        r["user_id"]: (r["stage"], r["sec_to_click"], r["sec_to_purchase"])
        for r in q["events_funnel"](spark, SF001).collect()
    }
    streamed = {
        r["user_id"]: (r["stage"], r["sec_to_click"], r["sec_to_purchase"])
        for r in q["stream_funnel"](spark, SF001).collect()
    }
    assert batch == streamed and len(batch) > 0


def test_text_kn_bigram_rooted_in_pinned_pairs(spark):
    """All four moment consumers read the PINNED pair-count frame — zero
    parquet scans in the final plan; top-20 is TakeOrderedAndProject."""
    q = entry.queries()
    p = physical_plan_string(q["text_kn_bigram"](spark, SF001))
    assert p.count("Scan parquet") == 0
    assert "TakeOrderedAndProject" in p


def test_docs_zorder_one_scan_no_shuffle_beyond_agg(spark):
    q = entry.queries()
    p = physical_plan_string(q["docs_zorder"](spark, SF001))
    assert p.count("Scan parquet") == 1
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


# ── theil_sen ────────────────────────────────────────────────────────────────


def test_theil_sen_exact_line_and_outlier_robust(spark):
    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        theil_sen,
    )

    rows = [("line", x, 5 * x + 3) for x in range(10)]
    # a line with one wild outlier: TS stays 2, OLS would not
    rows += [("rob", x, 2 * x if x != 5 else 10**6) for x in range(11)]
    df = spark.createDataFrame(rows, "k string, x int, y_c long")
    out = {r["k"]: r for r in theil_sen(df, ["k"]).collect()}
    assert out["line"]["ts_slope"] == 5.0
    assert out["line"]["n_pairs"] == 45
    assert out["rob"]["ts_slope"] == 2.0


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    import numpy as np

    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        theil_sen,
    )

    rng = random.Random(23)
    pts = [(x, rng.randrange(-1000, 1000)) for x in range(20)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "k string, x int, y_c long"
    )
    got = theil_sen(df, ["k"]).collect()[0]
    slopes = [
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    ]
    assert got["n_pairs"] == len(slopes)
    assert abs(got["ts_slope"] - float(np.median(slopes))) < 1e-12


def test_theil_sen_even_pair_count_averages_middles(spark):
    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        theil_sen,
    )

    # 4 points -> 6 pairs (even): slopes sorted, median = (s3 + s4)/2
    pts = [(0, 0), (1, 10), (2, 14), (3, 30)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "k string, x int, y_c long"
    )
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    )
    expect = (slopes[2] + slopes[3]) / 2
    got = theil_sen(df, ["k"]).collect()[0]
    assert got["n_pairs"] == 6 and abs(got["ts_slope"] - expect) < 1e-12


# ── kcenter_greedy ───────────────────────────────────────────────────────────


def _py_kcenter(pts, k):
    ids = sorted(pts)
    seed = ids[0]
    sel = [(seed, 0.0)]
    d2 = {
        i: sum((a - b) ** 2 for a, b in zip(pts[i], pts[seed])) for i in pts
    }
    for _ in range(1, k):
        nxt = max(d2, key=lambda i: (d2[i], -i))
        sel.append((nxt, d2[nxt]))
        for i in pts:
            nd = sum((a - b) ** 2 for a, b in zip(pts[i], pts[nxt]))
            d2[i] = min(d2[i], nd)
    return sel


def test_kcenter_matches_python_greedy(spark):
    from medical_doc_knowledge_graph_system_spark.functions.simsearch import (
        kcenter_greedy,
    )

    rng = random.Random(11)
    pts = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<double>"
    )
    got = [
        (r["vec_id"], r["radius2"])
        for r in kcenter_greedy(df, k=5)
        .orderBy("sel_rank")
        .collect()
    ]
    expect = _py_kcenter(pts, 5)
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gi, gd), (ei, ed) in zip(got, expect):
        assert abs(gd - ed) < 1e-9


def test_kcenter_radius_sequence_non_increasing(spark):
    from medical_doc_knowledge_graph_system_spark.functions.simsearch import (
        kcenter_greedy,
    )

    rng = random.Random(31)
    df = spark.createDataFrame(
        [(i, [rng.uniform(0, 10) for _ in range(4)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_greedy(df, k=6).orderBy("sel_rank").collect()
    radii = [r["radius2"] for r in rows[1:]]  # seed is 0.0 by convention
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))
    assert len({r["vec_id"] for r in rows}) == 6  # all distinct picks


def test_events_theilsen_rooted_in_pinned_daily(spark):
    q = entry.queries()
    p = physical_plan_string(q["events_theilsen"](spark, SF001))
    assert p.count("Scan parquet") == 0


# ── greedy_coloring ──────────────────────────────────────────────────────────


def _py_jp_coloring(edges, rounds=4):
    nodes = sorted({v for e in edges for v in e})
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    colors = {}
    uncolored = set(nodes)
    for r in range(1, rounds + 1):
        take = {
            v
            for v in uncolored
            if all(w not in uncolored or v > w for w in adj[v])
        }
        for v in take:
            colors[v] = r
        uncolored -= take
    return colors


def test_coloring_matches_python_and_is_proper(spark):
    from medical_doc_knowledge_graph_system_spark.operators.graph_analytics import (
        greedy_coloring,
    )

    rng = random.Random(19)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(200)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["name"]: r["color"] for r in greedy_coloring(df, rounds=4).collect()}
    expect = _py_jp_coloring(edges, rounds=4)
    assert got == expect
    # properness: no colored edge endpoint pair shares a color
    for a, b in edges:
        if a in got and b in got:
            assert got[a] != got[b]


def test_coloring_path_graph_known_answer(spark):
    from medical_doc_knowledge_graph_system_spark.operators.graph_analytics import (
        greedy_coloring,
    )

    # path 1-2-3-4-5: round 1 colors {5}, round 2 {4}, round 3 {3}, ...
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "a long, b long"
    )
    got = {r["name"]: r["color"] for r in greedy_coloring(df, rounds=4).collect()}
    assert got == {5: 1, 4: 2, 3: 3, 2: 4}  # node 1 left uncolored by budget


# ── anova_oneway ─────────────────────────────────────────────────────────────


def test_anova_matches_numpy_f(spark):
    import numpy as np

    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        anova_oneway,
    )

    rng = random.Random(37)
    groups = {g: [rng.randrange(0, 300) for _ in range(50 + 13 * i)] for i, g in enumerate("abc")}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, c long")
    got = anova_oneway(df, "g", "c").collect()[0]
    all_v = np.array([v for vs in groups.values() for v in vs], float)
    n, k = len(all_v), len(groups)
    m = all_v.mean()
    ssb = sum(len(vs) * (np.mean(vs) - m) ** 2 for vs in groups.values())
    ssw = sum(((np.array(vs, float) - np.mean(vs)) ** 2).sum() for vs in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k"] == k and got["n"] == n
    assert abs(got["ssb"] - ssb) < 1e-4
    assert abs(got["ssw"] - ssw) < 1e-4
    assert abs(got["f_stat"] - f) < 1e-6


def test_anova_identical_groups_f_zero(spark):
    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        anova_oneway,
    )

    rows = [(g, v) for g in "ab" for v in (10, 20, 30)]
    df = spark.createDataFrame(rows, "g string, c long")
    got = anova_oneway(df, "g", "c").collect()[0]
    assert got["ssb"] == 0.0 and got["f_stat"] == 0.0


# ── sample_systematic ────────────────────────────────────────────────────────


def test_systematic_matches_python_hit_walk(spark):
    import hashlib

    from medical_doc_knowledge_graph_system_spark.functions.curate import (
        sample_systematic,
    )

    rng = random.Random(43)
    docs = [(i, " ".join("w" for _ in range(rng.randrange(1, 400)))) for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    step, start = 256, (256 + 1) // 2
    got = {
        r["doc_id"]: (r["cum_tokens"], r["n_hits"])
        for r in sample_systematic(df, step=step).collect()
    }
    # python walk in md5 order
    order = sorted(docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
    cum, expect = 0, {}
    for doc_id, text in order:
        w = len(text.split(" "))
        hits = (cum + w + step - start) // step - (cum + step - start) // step
        cum += w
        if hits >= 1:
            expect[doc_id] = (cum, hits)
    assert got == expect
    # total multiplicity == number of hit points inside (0, total]
    assert sum(h for _, h in got.values()) == (cum + step - start) // step


def test_systematic_long_doc_multi_hit_and_validation(spark):
    import pytest

    from medical_doc_knowledge_graph_system_spark.functions.curate import (
        sample_systematic,
    )

    df = spark.createDataFrame(
        [(1, " ".join("w" for _ in range(1000)))], "doc_id long, text string"
    )
    got = sample_systematic(df, step=100).collect()
    assert got[0]["n_hits"] == 10  # 1000-token doc spans 10 hit points
    with pytest.raises(ValueError):
        sample_systematic(df, step=0)
    with pytest.raises(ValueError):
        sample_systematic(df, step=10, start=11)


def test_events_anova_one_scan(spark):
    q = entry.queries()
    p = physical_plan_string(q["events_anova"](spark, SF001))
    assert p.count("Scan parquet") == 1


def test_kg_coloring_zero_scans(spark):
    """Edge + node frames are pinned per round — the final union plan
    reads no parquet at all."""
    q = entry.queries()
    p = physical_plan_string(q["kg_coloring"](spark, SF001))
    assert p.count("Scan parquet") == 0


# ── events_markov2 / text_colloc_chi2 gate internals ─────────────────────────


def test_markov2_quantized_matrix_square_known_answer(spark):
    """Hand-checkable 2-state chain: A->B always, B->A 1/3 B->B 2/3."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    rows = []
    # user 1 sequence: A B B B A B A B B A  (ts strictly increasing)
    seq = "ABBBABABBA"
    for i, t in enumerate(seq):
        rows.append((1, i, t))
    df = spark.createDataFrame(rows, "user_id long, tsec long, event_type string")
    w_u = Window.partitionBy("user_id").orderBy("tsec")
    pairs = df.select(
        "event_type", F.lead("event_type").over(w_u).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    cnt = pairs.groupBy(
        F.col("event_type").alias("a"), F.col("next_type").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_tot = Window.partitionBy("a")
    qm = cnt.withColumn("tot", F.sum("c").over(w_tot).cast("long")).select(
        "a", "b", F.expr("(c * 1000000) div tot").alias("qv")
    )
    x, y = qm.alias("x"), qm.alias("y")
    p2 = {
        (r["src"], r["dst"]): r["p2"]
        for r in x.join(y, F.col("x.b") == F.col("y.a"))
        .groupBy(F.col("x.a").alias("src"), F.col("y.b").alias("dst"))
        .agg(
            F.round(
                F.sum(F.col("x.qv") * F.col("y.qv")).cast("long")
                / F.lit(1e12),
                4,
            ).alias("p2")
        )
        .collect()
    }
    # pairs: AB BB BB BA AB BA AB BB BA -> P(A->B)=3/3=1,
    # P(B->B)=3/6=0.5, P(B->A)=3/6=0.5
    # P2(A,A) = 1*0.5 ; P2(A,B) = 1*0.5
    # P2(B,A) = 0.5*0.5 ; P2(B,B) = 0.5*1 + 0.5*0.5 = 0.75
    assert p2[("A", "A")] == 0.5 and p2[("A", "B")] == 0.5
    assert p2[("B", "A")] == 0.25 and p2[("B", "B")] == 0.75


def test_colloc_chi2_flags_planted_collocation(spark):
    """'strong pair' always co-occurs; filler words pair randomly — the
    planted collocation must take rank 1 and match the python chi2."""
    q = entry.queries()
    # reuse the corpus-level gate on real testdata for rank stability
    rows = q["text_colloc_chi2"](spark, SF001).collect()
    assert len(rows) == 20
    # verify the TOP row's chi2 against a direct python recomputation
    top = rows[0]
    n, c12, c1, c2 = top["n"], top["c12"], top["c1"], top["c2"]
    d = n * c12 - c1 * c2
    expect = float(n) * float(d) * float(d) / (
        float(c1 * c2) * float((n - c1) * (n - c2))
    )
    assert abs(top["chi2"] - round(expect, 4)) < 1e-9
    # scores non-increasing down the ranking
    scores = [r["chi2"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_events_markov2_row_stochastic_within_quantization(spark):
    """Each src row of P2 sums to ~1 (micro-quantization loses < 1e-4)."""
    q = entry.queries()
    rows = q["events_markov2"](spark, SF001).collect()
    from collections import defaultdict

    per_src = defaultdict(float)
    for r in rows:
        per_src[r["src"]] += r["p2"]
    for src, tot in per_src.items():
        assert abs(tot - 1.0) < 1e-3, (src, tot)


def test_stream_anova_equals_batch(spark):
    q = entry.queries()
    b = q["events_anova"](spark, SF001).collect()[0]
    s = q["stream_anova"](spark, SF001).collect()[0]
    assert b.asDict() == s.asDict()


# ── rake_keywords ────────────────────────────────────────────────────────────


def _py_rake(texts, stops, k=20):
    from collections import Counter, defaultdict

    phrases = []
    for t in texts:
        run = []
        for tok in t.strip().lower().split(" "):
            if tok == "" or tok in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(tuple(run))
    freq, deg = Counter(), Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    wsq = {w: (deg[w] * 10**9) // freq[w] for w in freq}
    agg = defaultdict(lambda: [0, 0, 0])
    for ph in phrases:
        key = " ".join(ph)
        agg[key][0] = len(ph)
        agg[key][1] += 1
        agg[key][2] = sum(wsq[w] for w in ph)
    rows = sorted(
        ((k_, v[0], v[1], v[2]) for k_, v in agg.items()),
        key=lambda r: (-r[3], r[0]),
    )[:k]
    return [(p, nw, no, sq / 1e9) for p, nw, no, sq in rows]


def test_rake_matches_python_reference(spark):
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        rake_keywords,
    )
    from medical_doc_knowledge_graph_system_spark.functions.textfns import (
        _EN_STOPWORDS,
    )

    texts = [
        "the quick brown fox jumps over a lazy dog",
        "deep learning of neural networks is the core of modern ai",
        "neural networks and deep learning drive modern ai research",
        "a lazy dog sleeps in the sun",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["phrase"], r["n_words"], r["n_occur"], r["score"])
        for r in rake_keywords(df, k=20).collect()
    ]
    expect = _py_rake(texts, set(_EN_STOPWORDS), k=20)
    assert [(p, nw, no) for p, nw, no, _ in got] == [
        (p, nw, no) for p, nw, no, _ in expect
    ]
    for (_, _, _, gs), (_, _, _, es) in zip(got, expect):
        assert abs(gs - es) < 1e-9
    # multi-word phrases outrank single fillers (the RAKE property)
    assert got[0][1] >= 2

"""Fifteenth-session r5 operators: rank-based statistics (KS two-sample,
Kendall tau-b, Spearman rho, Kruskal-Wallis, trimmed mean, MAD, runs test)
— brute-force Python parity on small inputs plus edge handling."""

from __future__ import annotations

import math
import random

SF001 = "/root/testdata/sf0.001"


def _mid_ranks(xs):
    """Average (mid) ranks, 1-based, ties averaged."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + 1 + j + 1) / 2
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


# ── ks_2samp_pairs ───────────────────────────────────────────────────────────


def _py_ks(a, b):
    pooled = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = 0
    for x in pooled:
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * nb - cb * na))
    return best / (na * nb)


def test_ks_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        ks_2samp_pairs,
    )

    rng = random.Random(7)
    a = [rng.randrange(0, 40) / 2.0 for _ in range(60)]
    b = [rng.randrange(10, 60) / 2.0 for _ in range(45)]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v double"
    )
    got = ks_2samp_pairs(df, "g", "v").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["g1"], r["g2"]) == ("a", "b")
    assert (r["n1"], r["n2"]) == (60, 45)
    assert abs(r["ks_d"] - _py_ks(a, b)) < 1e-12


def test_ks_identical_samples_zero(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        ks_2samp_pairs,
    )

    vals = [1.0, 2.0, 2.0, 3.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals] + [("b", v) for v in vals],
        "g string, v double",
    )
    r = ks_2samp_pairs(df, "g", "v").collect()[0]
    assert r["d_num"] == 0 and r["ks_d"] == 0.0


def test_ks_disjoint_supports_one(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        ks_2samp_pairs,
    )

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(5)]
        + [("b", float(v)) for v in range(10, 15)],
        "g string, v double",
    )
    r = ks_2samp_pairs(df, "g", "v").collect()[0]
    assert r["ks_d"] == 1.0


def test_ks_pair_count_k_choose_2(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        ks_2samp_pairs,
    )

    rows = [(g, float(i % 7)) for g in "abcd" for i in range(9)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert ks_2samp_pairs(df, "g", "v").count() == 6


# ── kendall_tau_b ────────────────────────────────────────────────────────────


def _py_tau_b(xs, ys):
    n = len(xs)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xs[j] - xs[i]
            dy = ys[j] - ys[i]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                conc += 1
            elif dx != 0 and dy != 0:
                disc += 1
    n0 = n * (n - 1) // 2
    return (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))


def test_kendall_matches_bruteforce_with_ties(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        kendall_tau_b,
    )

    rng = random.Random(3)
    xs = [rng.randrange(0, 8) for _ in range(25)]
    ys = [x + rng.randrange(-3, 4) for x in xs]
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "k string, i int, x long, y long",
    )
    r = kendall_tau_b(df, ["k"], "i", "x", "y").collect()[0]
    assert r["n_pairs"] == 25 * 24 // 2
    assert abs(r["tau_b"] - _py_tau_b(xs, ys)) < 1e-12


def test_kendall_perfect_and_inverse(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        kendall_tau_b,
    )

    rows = [("up", i, i, 2 * i) for i in range(10)]
    rows += [("dn", i, i, -3 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, i int, x long, y long")
    out = {r["k"]: r for r in kendall_tau_b(df, ["k"], "i", "x", "y").collect()}
    assert out["up"]["tau_b"] == 1.0
    assert out["dn"]["tau_b"] == -1.0


# ── spearman_rho ─────────────────────────────────────────────────────────────


def _py_spearman(xs, ys):
    rx, ry = _mid_ranks(xs), _mid_ranks(ys)
    n = len(xs)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return num / den


def test_spearman_matches_bruteforce_with_ties(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        spearman_rho,
    )

    rng = random.Random(11)
    xs = [rng.randrange(0, 12) for _ in range(40)]
    ys = [x * 2 + rng.randrange(-5, 6) for x in xs]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "k string, x long, y long"
    )
    r = spearman_rho(df, ["k"], "x", "y").collect()[0]
    assert r["n"] == 40
    assert abs(r["rho"] - _py_spearman(xs, ys)) < 1e-9


def test_spearman_monotone_is_one(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        spearman_rho,
    )

    df = spark.createDataFrame(
        [("g", i, i * i) for i in range(15)], "k string, x long, y long"
    )
    r = spearman_rho(df, ["k"], "x", "y").collect()[0]
    assert r["rho"] == 1.0


# ── kruskal_wallis ───────────────────────────────────────────────────────────


def _py_kruskal(groups):
    all_vals = [v for g in groups for v in g]
    n = len(all_vals)
    ranks = _mid_ranks(all_vals)
    h = 0.0
    i = 0
    for g in groups:
        rg = ranks[i : i + len(g)]
        i += len(g)
        rbar = sum(rg) / len(rg)
        h += len(g) * (rbar - (n + 1) / 2) ** 2
    h *= 12 / (n * (n + 1))
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(all_vals).values())
    return h, h / (1 - ties / (n**3 - n))


def test_kruskal_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        kruskal_wallis,
    )

    rng = random.Random(5)
    groups = [
        [rng.randrange(0, 30) for _ in range(20)],
        [rng.randrange(5, 35) for _ in range(25)],
        [rng.randrange(10, 40) for _ in range(15)],
    ]
    rows = [
        ("b", f"g{gi}", v) for gi, g in enumerate(groups) for v in g
    ]
    df = spark.createDataFrame(rows, "bucket string, g string, v long")
    r = kruskal_wallis(df, ["bucket"], "g", "v").collect()[0]
    h, h_adj = _py_kruskal(groups)
    assert r["k"] == 3 and r["n"] == 60
    # between-term is micro-quantized at 1e-3 before the cross-group sum
    assert abs(r["h_stat"] - h) < 1e-3
    assert abs(r["h_adj"] - h_adj) < 1e-3


def test_kruskal_identical_groups_near_zero(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        kruskal_wallis,
    )

    rows = [("b", g, v) for g in ("x", "y") for v in range(10)]
    df = spark.createDataFrame(rows, "bucket string, g string, v long")
    r = kruskal_wallis(df, ["bucket"], "g", "v").collect()[0]
    assert abs(r["h_stat"]) < 1e-9


# ── trimmed_mean ─────────────────────────────────────────────────────────────


def test_trimmed_mean_drops_tails(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        trimmed_mean,
    )

    vals = list(range(1, 21))  # 20 rows -> trim 2 each side
    rng = random.Random(9)
    rng.shuffle(vals)
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    r = trimmed_mean(df, ["k"], "v", 1).collect()[0]
    kept = list(range(3, 19))
    assert r["n"] == 20 and r["n_kept"] == 16
    assert r["sum_kept"] == sum(kept)
    assert r["trimmed_mean"] == sum(kept) / 16


def test_trimmed_mean_outlier_robust(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        trimmed_mean,
    )

    vals = [10] * 18 + [10**9, -(10**9)]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    r = trimmed_mean(df, ["k"], "v", 1).collect()[0]
    assert r["trimmed_mean"] == 10.0


# ── median_abs_deviation ─────────────────────────────────────────────────────


def _py_median(xs):
    s = sorted(xs)
    m = len(s)
    return (s[(m + 1) // 2 - 1] + s[m // 2]) / 2


def test_mad_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        median_abs_deviation,
    )

    rng = random.Random(13)
    xs = [rng.randrange(0, 10000) / 100.0 for _ in range(31)]
    df = spark.createDataFrame([("g", v) for v in xs], "k string, v double")
    r = median_abs_deviation(df, ["k"], "v").collect()[0]
    med = _py_median(xs)
    mad = _py_median([abs(x - med) for x in xs])
    assert r["n"] == 31
    assert r["med"] == med
    assert r["mad"] == mad


def test_mad_constant_series_zero(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        median_abs_deviation,
    )

    df = spark.createDataFrame(
        [("g", 5.0)] * 9, "k string, v double"
    )
    r = median_abs_deviation(df, ["k"], "v").collect()[0]
    assert r["med"] == 5.0 and r["mad"] == 0.0


# ── runs_test ────────────────────────────────────────────────────────────────


def _py_runs(vals):
    med = _py_median(vals)
    sides = [1 if v > med else 0 for v in vals if v != med]
    n1 = sum(sides)
    n2 = len(sides) - n1
    runs = 1 + sum(1 for a, b in zip(sides, sides[1:]) if a != b)
    n = n1 + n2
    two = 2 * n1 * n2
    mu = 1 + two / n
    s2 = two * (two - n) / (n * n * (n - 1))
    return n1, n2, runs, (runs - mu) / math.sqrt(s2)


def test_runs_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        runs_test,
    )

    rng = random.Random(17)
    vals = [rng.randrange(0, 1000) / 10.0 for _ in range(41)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "k string, o int, v double",
    )
    r = runs_test(df, ["k"], "o", "v").collect()[0]
    n1, n2, runs, z = _py_runs(vals)
    assert (r["n1"], r["n2"], r["runs"]) == (n1, n2, runs)
    assert abs(r["z_runs"] - z) < 1e-12


def test_runs_alternating_series_high_z(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        runs_test,
    )

    vals = [float(i % 2) for i in range(20)]  # perfect alternation
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "k string, o int, v double",
    )
    r = runs_test(df, ["k"], "o", "v").collect()[0]
    assert r["runs"] == 20  # every step flips
    assert r["z_runs"] > 2.0


def test_runs_median_ties_dropped(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        runs_test,
    )

    vals = [1.0, 2.0, 2.0, 2.0, 3.0, 1.0, 3.0]  # median 2.0 dropped
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "k string, o int, v double",
    )
    r = runs_test(df, ["k"], "o", "v").collect()[0]
    assert r["n1"] + r["n2"] == 4


# ── gate-query plan shape ────────────────────────────────────────────────────


def test_ks_gate_single_scan(spark):
    import __spark_entry__ as entry
    from medical_doc_knowledge_graph_system_spark.plans.checks import (
        physical_plan_string,
    )

    df = entry.queries()["events_ks"](spark, SF001)
    plan = physical_plan_string(df)
    # cells frame is pinned; the pair fan-out must not rescan the parquet
    assert plan.count("Scan parquet") == 0


# ── mann_whitney_pairs ───────────────────────────────────────────────────────


def _py_mwu(a, b):
    pooled = sorted(a + b)
    ranks = _mid_ranks(pooled)
    rank_of = {}
    # recompute mid-ranks by value
    from collections import Counter, defaultdict

    by_val = defaultdict(list)
    for i, v in enumerate(pooled):
        by_val[v].append(ranks[i])
    rank_of = {v: sum(rs) / len(rs) for v, rs in by_val.items()}
    r1 = sum(rank_of[v] for v in a)
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    ties = sum(
        t**3 - t for t in Counter(pooled).values()
    )
    var = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    return 2 * u1, z


def test_mann_whitney_matches_bruteforce(spark):
    rng = random.Random(61)
    a = [rng.randrange(0, 40) for _ in range(30)]
    b = [rng.randrange(10, 50) for _ in range(25)]

    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        mann_whitney_pairs,
    )

    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    r = mann_whitney_pairs(df, "g", "v").collect()[0]
    u2, z = _py_mwu(a, b)
    assert r["u2"] == u2
    assert abs(r["z_u"] - z) < 1e-12


def test_mann_whitney_shifted_distribution_significant(spark):
    from medical_doc_knowledge_graph_system_spark.functions.rankstats import (
        mann_whitney_pairs,
    )

    a = list(range(0, 50))
    b = list(range(100, 150))  # fully separated -> extreme z
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    r = mann_whitney_pairs(df, "g", "v").collect()[0]
    assert r["u2"] == 0  # group a never wins
    assert r["z_u"] < -5

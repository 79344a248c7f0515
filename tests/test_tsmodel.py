"""Sixteenth-session r5 operators: time-series model estimation (Yule-Walker
AR(2), Ljung-Box, variance ratio, Haar energy, matrix profile, isotonic
regression) — brute-force Python parity on small series plus structural
properties (isotonic monotonicity == PAVA, Haar energy conservation)."""

from __future__ import annotations

import math
import random


def _series_df(spark, xs, key="a"):
    rows = [(key, i + 1, int(v)) for i, v in enumerate(xs)]
    return spark.createDataFrame(rows, "k string, pos long, x long")


def _acov(xs, k):
    n = len(xs)
    m = sum(xs) / n
    return sum((xs[t] - m) * (xs[t + k] - m) for t in range(n - k))


# ── yule_walker_ar2 ──────────────────────────────────────────────────────────


def test_ar2_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        yule_walker_ar2,
    )

    rng = random.Random(7)
    xs = [rng.randrange(0, 1000) for _ in range(30)]
    row = yule_walker_ar2(_series_df(spark, xs), ["k"]).collect()[0]
    c0, c1, c2 = _acov(xs, 0), _acov(xs, 1), _acov(xs, 2)
    r1, r2 = c1 / c0, c2 / c0
    den = 1 - r1 * r1
    assert row["n"] == 30
    assert abs(row["r1"] - r1) < 1e-9
    assert abs(row["r2"] - r2) < 1e-9
    assert abs(row["phi1"] - r1 * (1 - r2) / den) < 1e-9
    assert abs(row["phi2"] - (r2 - r1 * r1) / den) < 1e-9


def test_ar2_recovers_strong_ar1_signal(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        yule_walker_ar2,
    )

    # a sawtooth-free, strongly persistent integer series: slow ramp
    xs = [1000 + 10 * t for t in range(30)]
    row = yule_walker_ar2(_series_df(spark, xs), ["k"]).collect()[0]
    assert row["r1"] > 0.8  # a deterministic ramp is highly autocorrelated


# ── ljung_box ────────────────────────────────────────────────────────────────


def test_ljungbox_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        ljung_box,
    )

    rng = random.Random(11)
    xs = [rng.randrange(0, 500) for _ in range(25)]
    row = ljung_box(_series_df(spark, xs), ["k"], max_lag=3).collect()[0]
    n = len(xs)
    c0 = _acov(xs, 0)
    expect = (
        n
        * (n + 2)
        * sum((_acov(xs, k) / c0) ** 2 / (n - k) for k in (1, 2, 3))
    )
    assert abs(row["q_lb"] - expect) < 1e-7


# ── variance_ratio ───────────────────────────────────────────────────────────


def test_vratio_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        variance_ratio,
    )

    rng = random.Random(3)
    xs = [rng.randrange(0, 200) for _ in range(30)]
    row = variance_ratio(_series_df(spark, xs), ["k"], q=5).collect()[0]

    def var(v):
        m = sum(v) / len(v)
        return sum((e - m) ** 2 for e in v) / (len(v) - 1)

    ys = [sum(xs[b * 5 : b * 5 + 5]) for b in range(6)]
    assert row["n"] == 30 and row["nb"] == 6
    assert abs(row["vr"] - var(ys) / (5 * var(xs))) < 1e-9


def test_vratio_drops_incomplete_trailing_bucket(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        variance_ratio,
    )

    xs = list(range(1, 29))  # 28 points -> 5 complete buckets + 3 leftover
    row = variance_ratio(_series_df(spark, xs), ["k"], q=5).collect()[0]
    assert row["nb"] == 5


# ── haar_energy ──────────────────────────────────────────────────────────────


def _haar_levels(xs):
    """(level -> detail energy) by explicit cascade on sums."""
    out = {}
    cur = list(xs)
    level = 1
    while len(cur) >= 2:
        det = [cur[2 * j] - cur[2 * j + 1] for j in range(len(cur) // 2)]
        out[level] = sum(d * d for d in det)
        cur = [cur[2 * j] + cur[2 * j + 1] for j in range(len(cur) // 2)]
        level += 1
    return out


def test_haar_matches_cascade(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        haar_energy,
    )

    rng = random.Random(5)
    xs = [rng.randrange(0, 10000) for _ in range(20)]  # extra rows ignored
    rows = haar_energy(_series_df(spark, xs), ["k"], levels=4).collect()
    expect = _haar_levels(xs[:16])
    got = {r["level"]: r["energy"] for r in rows}
    assert got == {k: expect[k] for k in (1, 2, 3, 4)}
    assert all(r["n_blocks"] == 16 >> r["level"] for r in rows)


def test_haar_flat_series_zero_energy(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        haar_energy,
    )

    rows = haar_energy(_series_df(spark, [7] * 16), ["k"], levels=4).collect()
    assert all(r["energy"] == 0 for r in rows)


# ── matrix_profile ───────────────────────────────────────────────────────────


def test_matrix_profile_matches_bruteforce(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        matrix_profile,
    )

    rng = random.Random(13)
    xs = [rng.randrange(0, 100) for _ in range(18)]
    rows = matrix_profile(_series_df(spark, xs), ["k"], m=4).collect()
    n_win = len(xs) - 3
    wins = {i + 1: xs[i : i + 4] for i in range(n_win)}
    for r in rows:
        cand = [
            (sum((a - b) ** 2 for a, b in zip(wins[r["i"]], wins[j])), j)
            for j in wins
            if abs(j - r["i"]) >= 4
        ]
        d2, j = min(cand)
        assert (r["d2"], r["nn"]) == (d2, j)
        assert abs(r["dist"] - math.sqrt(d2)) < 1e-9
    assert len(rows) == n_win


def test_matrix_profile_planted_motif(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        matrix_profile,
    )

    # plant the same 4-gram at positions 1 and 11 of an otherwise-noisy run
    xs = [900, 100, 800, 200] + [55, 61, 47, 58, 52, 63] + [900, 100, 800, 200] + [50, 59]
    rows = {r["i"]: r for r in matrix_profile(_series_df(spark, xs), ["k"], m=4).collect()}
    assert rows[1]["d2"] == 0 and rows[1]["nn"] == 11
    assert rows[11]["d2"] == 0 and rows[11]["nn"] == 1


# ── isotonic_fit ─────────────────────────────────────────────────────────────


def _pava(xs):
    """Pool-adjacent-violators for non-decreasing L2 fit."""
    blocks = [[float(x), 1] for x in xs]  # [mean, weight]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] > out[-1][0] - 1e-15:
            m2, w2 = out.pop()
            m1, w1 = out.pop()
            out.append([(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2])
    fit = []
    for m, w in out:
        fit.extend([m] * w)
    return fit


def test_isotonic_matches_pava(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        isotonic_fit,
    )

    rng = random.Random(17)
    xs = [rng.randrange(0, 1000) for _ in range(20)]
    rows = sorted(
        isotonic_fit(_series_df(spark, xs), ["k"]).collect(),
        key=lambda r: r["pos"],
    )
    expect = _pava(xs)
    for r, e in zip(rows, expect):
        assert abs(r["fit"] - e) < 1e-9
    fits = [r["fit"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))


def test_isotonic_already_monotone_is_identity(spark):
    from medical_doc_knowledge_graph_system_spark.operators.tsmodel import (
        isotonic_fit,
    )

    xs = [1, 5, 5, 9, 12, 40]
    rows = sorted(
        isotonic_fit(_series_df(spark, xs), ["k"]).collect(),
        key=lambda r: r["pos"],
    )
    assert [r["fit"] for r in rows] == [float(x) for x in xs]

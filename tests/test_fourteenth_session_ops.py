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

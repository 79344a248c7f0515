"""Thirteenth-session r5 operators: OLS/Mann-Kendall trend statistics,
the 2-D skyline operator (brute-force dominance oracle), and plan pins
for the six adapted TPC-H shapes (Q2/Q9/Q11/Q12/Q16/Q21)."""

from __future__ import annotations

import random

import __spark_entry__ as entry
from medical_doc_knowledge_graph_system_spark.plans.checks import (
    physical_plan_string,
)

SF001 = "/root/testdata/sf0.001"


# ── trend_ols ────────────────────────────────────────────────────────────────


def test_trend_ols_recovers_exact_line(spark):
    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        trend_ols,
    )

    rows = [("a", x, 3 * x + 7) for x in range(10)] + [
        ("b", x, -2 * x + 100) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, x int, y_c long")
    out = {r["k"]: r for r in trend_ols(df, ["k"]).collect()}
    assert out["a"]["slope"] == 3.0 and out["a"]["intercept"] == 7.0
    assert out["a"]["n"] == 10
    assert out["b"]["slope"] == -2.0 and out["b"]["intercept"] == 100.0


def test_trend_ols_matches_numpy_on_random_series(spark):
    import numpy as np

    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        trend_ols,
    )

    rng = random.Random(13)
    xs = list(range(40))
    ys = [rng.randrange(-(10**6), 10**6) for _ in xs]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "k string, x int, y_c long"
    )
    got = trend_ols(df, ["k"]).collect()[0]
    slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert abs(got["slope"] - slope) < 1e-6 * max(1.0, abs(slope))
    assert abs(got["intercept"] - intercept) < 1e-4 * max(1.0, abs(intercept))


# ── mann_kendall_s ───────────────────────────────────────────────────────────


def test_mann_kendall_known_answers(spark):
    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        mann_kendall_s,
    )

    rows = (
        # strictly rising: S = C(4,2) = 6
        [("up", x, 10 * x) for x in range(4)]
        # strictly falling: S = -6
        + [("dn", x, -5 * x) for x in range(4)]
        # constant: S = 0, 6 pairs
        + [("fl", x, 42) for x in range(4)]
        # single point: 0 pairs (left-join coalesce path)
        + [("one", 0, 1)]
    )
    df = spark.createDataFrame(rows, "k string, x int, y_c long")
    out = {r["k"]: r for r in mann_kendall_s(df, ["k"]).collect()}
    assert out["up"]["s_stat"] == 6 and out["up"]["n_pairs"] == 6
    assert out["dn"]["s_stat"] == -6
    assert out["fl"]["s_stat"] == 0 and out["fl"]["n_pairs"] == 6
    assert out["one"]["n_points"] == 1 and out["one"]["n_pairs"] == 0
    assert out["one"]["s_stat"] == 0


# ── skyline_2d_max ───────────────────────────────────────────────────────────


def _brute_skyline(pts):
    out = []
    for i, (px, py) in enumerate(pts):
        dom = any(
            (qx > px and qy >= py) or (qx == px and qy > py)
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )
        if not dom:
            out.append(i)
    return sorted(out)


def test_skyline_matches_bruteforce_with_ties_and_dups(spark):
    from medical_doc_knowledge_graph_system_spark.operators.skyline import (
        skyline_2d_max,
    )

    rng = random.Random(7)
    # small coordinate range forces ties AND exact duplicate points;
    # duplicated frontier points must ALL survive
    pts = [(rng.randrange(0, 25), rng.randrange(0, 25)) for _ in range(300)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )
    got = sorted(
        r["id"] for r in skyline_2d_max(df, "x", "y", bucket_width=8).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_single_point_and_total_order(spark):
    from medical_doc_knowledge_graph_system_spark.operators.skyline import (
        skyline_2d_max,
    )

    df = spark.createDataFrame([(0, 5, 5)], "id long, x long, y long")
    assert skyline_2d_max(df, "x", "y").count() == 1
    # strictly increasing on both dims: only the max survives
    df2 = spark.createDataFrame(
        [(i, i, i) for i in range(10)], "id long, x long, y long"
    )
    assert [r["id"] for r in skyline_2d_max(df2, "x", "y").collect()] == [9]


# ── plan pins ────────────────────────────────────────────────────────────────


def test_tpch_waiting_suppliers_rooted_in_pinned_flags(spark):
    """Q21 shape: the per-(order,supplier) flag frame is computed ONCE and
    pinned; the final plan's only parquet scan is the supplier dimension
    feeding the broadcast name join. The n_supp/n_late filter must ride a
    LEFT SEMI (never re-materialize matched orders), and the top-20 must
    be TakeOrderedAndProject."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_waiting_suppliers"](spark, SF001))
    assert p.count("Scan parquet") == 1
    assert "LeftSemi" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_shipmode_pushes_year_window(spark):
    """Q12 shape: the ship-year window reaches the lineitem scan as pushed
    filters; the lateness bound is a residual on the one fact-fact join."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_shipmode"](spark, SF001))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_supplier_cnt_anti_join_then_broadcast(spark):
    """Q16 shape: NOT IN (complaint suppliers) plans as a broadcast LEFT
    ANTI against the fact; the filtered part slice broadcasts; the brand/
    type/size filters reach the part scan."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_supplier_cnt"](spark, SF001))
    assert "LeftAnti" in p
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_important_parts_rooted_in_pinned_aggregate(spark):
    """Q11 shape: the per-part aggregate is pinned (scalar + filter both
    consume it) — zero parquet scans in the final plan; the 1-row scalar
    rides a broadcast nested-loop cross join BY DESIGN."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_important_parts"](spark, SF001))
    assert p.count("Scan parquet") == 0


def test_tpch_profit_broadcasts_every_dimension(spark):
    """Q9 shape: part (filtered), supplier, nation all broadcast; the only
    shuffle join is lineitem-orders."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_profit"](spark, SF001))
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_min_cost_supp_rooted_in_pinned_offers(spark):
    """Q2 shape: offers and the Europe dimension are both pinned — the
    final decorrelated min-rejoin plans with ZERO parquet scans — and the
    top-100 is TakeOrderedAndProject."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_min_cost_supp"](spark, SF001))
    assert p.count("Scan parquet") == 0
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_events_mann_kendall_rooted_in_pinned_daily(spark):
    """Both self-join branches and the count read the PINNED daily frame —
    zero parquet scans in the final plan."""
    q = entry.queries()
    p = physical_plan_string(q["events_mann_kendall"](spark, SF001))
    assert p.count("Scan parquet") == 0


def test_docs_skyline_one_scan_and_broadcast_joinback(spark):
    """The group-max pass runs once at pin time, so the FINAL plan holds
    exactly one parquet scan (the join-back side) and the surviving (x, y)
    set joins back as a broadcast."""
    q = entry.queries()
    p = physical_plan_string(q["docs_skyline"](spark, SF001))
    assert p.count("Scan parquet") == 1
    assert "BroadcastHashJoin" in p


# ── autocorr_lag ─────────────────────────────────────────────────────────────


def test_autocorr_matches_numpy_and_drops_gaps(spark):
    import numpy as np

    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        autocorr_lag,
    )

    rng = random.Random(29)
    ys = [rng.randrange(0, 10**6) for _ in range(30)]
    rows = [("g", x, y) for x, y in zip(range(30), ys)]
    # a gapped key: days 0..4 and 7..11 — pairs only within each run
    rows += [("gap", x, (x + 1) * 10) for x in [0, 1, 2, 3, 4, 7, 8, 9, 10, 11]]
    df = spark.createDataFrame(rows, "k string, x int, y_c long")
    out = {r["k"]: r for r in autocorr_lag(df, ["k"], lag=1).collect()}

    a = np.array(ys[:-1], float)
    b = np.array(ys[1:], float)
    expect = np.corrcoef(a, b)[0, 1]
    assert out["g"]["n_pairs"] == 29
    assert abs(out["g"]["acf"] - expect) < 1e-9
    # gapped: 4 pairs per run = 8 total; series is exactly linear within
    # runs, so r = 1.0
    assert out["gap"]["n_pairs"] == 8
    assert abs(out["gap"]["acf"] - 1.0) < 1e-12


def test_autocorr_perfect_alternation_is_minus_one(spark):
    from medical_doc_knowledge_graph_system_spark.operators.timeseries import (
        autocorr_lag,
    )

    df = spark.createDataFrame(
        [("k", x, 100 if x % 2 == 0 else 200) for x in range(10)],
        "k string, x int, y_c long",
    )
    got = autocorr_lag(df, ["k"], lag=1).collect()[0]
    assert abs(got["acf"] + 1.0) < 1e-12


# ── check_suite ──────────────────────────────────────────────────────────────


def test_check_suite_flags_violations_in_one_scan(spark):
    from pyspark.sql import functions as F

    from medical_doc_knowledge_graph_system_spark.functions.profiling import (
        check_suite,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, None), (2, "c")], "id long, txt string"
    )
    checks = [
        ("row_count", F.count(F.lit(1)), F.col("row_count") >= 1),
        (
            "null_txt",
            F.sum(F.when(F.col("txt").isNull(), 1).otherwise(0)),
            F.col("null_txt") == 0,
        ),
        (
            "dup_id",
            F.count(F.lit(1)) - F.countDistinct("id"),
            F.col("dup_id") == 0,
        ),
    ]
    out = {r["check_name"]: r for r in check_suite(df, checks).collect()}
    assert out["row_count"]["observed"] == 3 and out["row_count"]["passed"]
    assert out["null_txt"]["observed"] == 1 and not out["null_txt"]["passed"]
    assert out["dup_id"]["observed"] == 1 and not out["dup_id"]["passed"]
    p = physical_plan_string(check_suite(df, checks))
    assert p.count("Scan ExistingRDD") <= 1


def test_docs_checks_one_scan(spark):
    """The whole 6-constraint suite costs ONE parquet scan."""
    q = entry.queries()
    p = physical_plan_string(q["docs_checks"](spark, SF001))
    assert p.count("Scan parquet") == 1


def test_events_autocorr_rooted_in_pinned_daily(spark):
    q = entry.queries()
    p = physical_plan_string(q["events_autocorr"](spark, SF001))
    assert p.count("Scan parquet") == 0


def test_tpch_part_promotion_single_conditional_aggregate(spark):
    """Q20 shape: both correlated aggregates fold into ONE conditional
    aggregation — one lineitem scan, part + supplier broadcast."""
    q = entry.queries()
    p = physical_plan_string(q["tpch_part_promotion"](spark, SF001))
    assert p.count("Scan parquet") == 3  # lineitem + part + supplier, once each
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

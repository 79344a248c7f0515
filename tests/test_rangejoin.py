"""Bucketed range join (operators/rangejoin.py): known-answer window
semantics + randomized equality vs the naive inequality join, across
bucket widths (the result must be bucket-width-invariant)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.operators.rangejoin import (
    interval_point_count,
    interval_point_join,
)

pytestmark = pytest.mark.usefixtures("spark")

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _intervals_df(spark, rows):
    # rows: (iid, key, begin_s, end_s)
    return spark.createDataFrame(
        [(i, k, _ts(b), _ts(e)) for i, k, b, e in rows],
        "iid long, k long, ts_begin timestamp, ts_end timestamp",
    )


def _points_df(spark, rows):
    # rows: (pid, key, at_s)
    return spark.createDataFrame(
        [(p, k, _ts(a)) for p, k, a in rows],
        "pid long, k long, ts timestamp",
    )


def _naive(iv_rows, pt_rows):
    out = set()
    for i, ik, b, e in iv_rows:
        for p, pk, a in pt_rows:
            if ik == pk and b <= a < e:
                out.add((i, p))
    return out


def test_halfopen_window_known_answer(spark):
    iv = _intervals_df(spark, [(1, 7, 100, 200)])
    pts = _points_df(
        spark,
        [(10, 7, 99), (11, 7, 100), (12, 7, 150), (13, 7, 200), (14, 8, 150)],
    )
    got = {
        (r.iid, r.p_pid)
        for r in interval_point_join(iv, pts, keys=["k"]).collect()
    }
    # begin inclusive, end exclusive, key must match
    assert got == {(1, 11), (1, 12)}


def test_zero_count_intervals_kept(spark):
    iv = _intervals_df(spark, [(1, 7, 100, 200), (2, 7, 1000, 1100)])
    pts = _points_df(spark, [(10, 7, 150)])
    got = {
        r.iid: r.n_points
        for r in interval_point_count(iv, pts, keys=["k"], interval_id="iid").collect()
    }
    assert got == {1: 1, 2: 0}


@pytest.mark.parametrize("bucket_s", [7, 1800, 1 << 20])
def test_matches_naive_any_bucket_width(spark, bucket_s):
    rng = random.Random(42)
    iv_rows = [
        (i, rng.randrange(5), b, b + rng.randrange(1, 5000))
        for i, b in ((i, rng.randrange(100_000)) for i in range(60))
    ]
    pt_rows = [
        (p, rng.randrange(5), rng.randrange(100_000)) for p in range(400)
    ]
    iv = _intervals_df(spark, iv_rows)
    pts = _points_df(spark, pt_rows)
    got = {
        (r.iid, r.p_pid)
        for r in interval_point_join(iv, pts, keys=["k"], bucket_s=bucket_s).collect()
    }
    assert got == _naive(iv_rows, pt_rows)


def test_pair_emitted_exactly_once(spark):
    # a long interval spanning many buckets must still emit one row per match
    iv = _intervals_df(spark, [(1, 7, 0, 90_000)])
    pts = _points_df(spark, [(10, 7, 45_000)])
    rows = interval_point_join(iv, pts, keys=["k"], bucket_s=60).collect()
    assert len(rows) == 1


def test_plan_is_equi_join_not_nested_loop(spark):
    from medical_doc_knowledge_graph_system_spark.plans.checks import (
        physical_plan_string,
    )

    iv = _intervals_df(spark, [(1, 7, 100, 200)])
    pts = _points_df(spark, [(10, 7, 150)])
    plan = physical_plan_string(interval_point_join(iv, pts, keys=["k"]))
    assert "NestedLoop" not in plan and "Cartesian" not in plan

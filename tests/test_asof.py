"""As-of join (operators/asof.py): known-answer + pandas merge_asof equality.

The driver gate (events_asof) proves exact parity against DuckDB's native
ASOF LEFT JOIN; these tests pin the semantics on hand-built frames (exact
match, tolerance nulling, tie-break determinism, no-match nulls) and
against pandas.merge_asof on a seeded random input — an oracle that shares
no code with the window implementation.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from medical_doc_knowledge_graph_system_spark.operators.asof import asof_join

pytestmark = pytest.mark.usefixtures("spark")


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_known_answer(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(100)), (2, "u", _ts(10)), (3, "v", _ts(50))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "u", _ts(100)), (11, "u", _ts(40)), (12, "w", _ts(1))],
        "rid long, k string, ts timestamp",
    )
    got = {
        r.lid: r.r_rid
        for r in asof_join(left, right, on=["k"], tiebreak="rid").collect()
    }
    # lid=1: exact-timestamp match allowed -> rid 10; lid=2: no right row at
    # or before ts(10) -> NULL; lid=3: key v has no right rows -> NULL
    assert got == {1: 10, 2: None, 3: None}


def test_asof_tolerance_nulls_stale_match(spark):
    left = spark.createDataFrame([(1, "u", _ts(1000))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame([(9, "u", _ts(10))], "rid long, k string, ts timestamp")
    no_tol = asof_join(left, right, on=["k"]).collect()[0]
    tol = asof_join(left, right, on=["k"], tolerance=60.0).collect()[0]
    assert no_tol.r_rid == 9 and tol.r_rid is None and tol.r_ts is None


def test_asof_equal_ts_tiebreak_takes_greatest(spark):
    left = spark.createDataFrame([(1, "u", 50.0)], "lid long, k string, ts double")
    right = spark.createDataFrame(
        [(7, "u", 50.0), (8, "u", 50.0), (3, "u", 49.0)],
        "rid long, k string, ts double",
    )
    got = asof_join(left, right, on=["k"], tiebreak="rid").collect()[0]
    assert got.r_rid == 8


def test_asof_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    lrows = [
        (i, f"k{rng.randrange(5)}", float(rng.randrange(10_000)))
        for i in range(300)
    ]
    # unique (key, ts) on the right so backward-asof is tiebreak-free
    seen, rrows = set(), []
    for i in range(300):
        k, t = f"k{rng.randrange(5)}", float(rng.randrange(10_000))
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((1000 + i, k, t))
    left = spark.createDataFrame(lrows, "lid long, k string, ts double")
    right = spark.createDataFrame(rrows, "rid long, k string, ts double")
    got = (
        asof_join(left, right, on=["k"], tolerance=500.0)
        .select("lid", "r_rid")
        .toPandas()
        .set_index("lid")["r_rid"]
        .sort_index()
    )
    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values("ts")
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction="backward", tolerance=500.0)
        .set_index("lid")["rid"]
        .sort_index()
    )
    assert got.isna().equals(exp.isna())
    mask = ~exp.isna()
    assert (got[mask] == exp[mask]).all()


def test_asof_forward_known_answer(spark):
    left = spark.createDataFrame([(1, "u", 50.0)], "lid long, k string, ts double")
    right = spark.createDataFrame(
        [(5, "u", 40.0), (6, "u", 50.0), (7, "u", 70.0)],
        "rid long, k string, ts double",
    )
    got = asof_join(left, right, on=["k"], direction="forward").collect()[0]
    assert got.r_rid == 6  # exact-ts match qualifies forward too
    got2 = asof_join(
        left,
        right.where("rid <> 6"),
        on=["k"],
        direction="forward",
        tolerance=10.0,
    ).collect()[0]
    assert got2.r_rid is None  # next match at 70 is outside the 10 s tolerance


def test_asof_forward_matches_pandas(spark):
    rng = random.Random(13)
    lrows = [(i, f"k{rng.randrange(4)}", float(rng.randrange(5000))) for i in range(200)]
    seen, rrows = set(), []
    for i in range(200):
        k, t = f"k{rng.randrange(4)}", float(rng.randrange(5000))
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((1000 + i, k, t))
    left = spark.createDataFrame(lrows, "lid long, k string, ts double")
    right = spark.createDataFrame(rrows, "rid long, k string, ts double")
    got = (
        asof_join(left, right, on=["k"], direction="forward", tolerance=300.0)
        .select("lid", "r_rid")
        .toPandas()
        .set_index("lid")["r_rid"]
        .sort_index()
    )
    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "k", "ts"]).sort_values("ts")
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction="forward", tolerance=300.0)
        .set_index("lid")["rid"]
        .sort_index()
    )
    assert got.isna().equals(exp.isna())
    mask = ~exp.isna()
    assert (got[mask] == exp[mask]).all()

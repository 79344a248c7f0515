"""Conversion funnel (operators/funnel.py): known-answer chain semantics +
randomized equality vs a direct python matcher."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from medical_doc_knowledge_graph_system_spark.operators.funnel import funnel

pytestmark = pytest.mark.usefixtures("spark")

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(u, t, _ts(m)) for u, t, m in rows],
        "user_id long, event_type string, ts timestamp",
    )


def _py_funnel(rows, steps):
    """Greedy-earliest strict-chain matcher on python lists."""
    by_user = {}
    for u, t, m in rows:
        by_user.setdefault(u, []).append((m, t))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        last = None
        ts = []
        for step in steps:
            nxt = min(
                (m for m, t in evs if t == step and (last is None or m > last)),
                default=None,
            )
            if nxt is None:
                break
            ts.append(nxt)
            last = nxt
        if ts:
            out[u] = (len(ts), tuple(ts))
    return out


def test_funnel_chain_semantics(spark):
    rows = [
        # user 1 completes all three, with a decoy click BEFORE the view
        (1, "click", 0), (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # user 2: purchase before the click -> stalls at stage 2
        (2, "view", 0), (2, "purchase", 1), (2, "click", 2),
        # user 3: view only
        (3, "view", 5),
        # user 4: never views -> absent entirely
        (4, "click", 0), (4, "purchase", 1),
    ]
    got = {
        r.user_id: (r.stage, r.t_0, r.t_1, r.t_2)
        for r in funnel(
            _events_df(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (3, _ts(1), _ts(2), _ts(3))
    assert got[2] == (2, _ts(0), _ts(2), None)
    assert got[3] == (1, _ts(5), None, None)


def test_funnel_same_timestamp_does_not_advance(spark):
    # the click lands at EXACTLY the view's timestamp: strict > rejects it
    rows = [(1, "view", 0), (1, "click", 0), (1, "click", 7)]
    got = funnel(_events_df(spark, rows), ["view", "click"]).collect()[0]
    assert (got.stage, got.t_1) == (2, _ts(7))
    rows = [(1, "view", 0), (1, "click", 0)]
    got = funnel(_events_df(spark, rows), ["view", "click"]).collect()[0]
    assert (got.stage, got.t_1) == (1, None)


def test_funnel_matches_python_oracle(spark):
    rng = random.Random(7)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (rng.randint(1, 25), rng.choice(types), rng.randint(0, 500))
        for _ in range(400)
    ]
    # dedup (user, type, minute) so the python matcher's min is unambiguous
    rows = sorted({(u, t, m) for u, t, m in rows})
    steps = ["view", "click", "purchase"]
    got = {
        r.user_id: (r.stage, tuple(t for t in (r.t_0, r.t_1, r.t_2) if t))
        for r in funnel(_events_df(spark, rows), steps).collect()
    }
    want = {
        u: (n, tuple(_ts(m) for m in ts)) for u, (n, ts) in _py_funnel(rows, steps).items()
    }
    assert got == want


def test_funnel_single_step_raises(spark):
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel(_events_df(spark, [(1, "view", 0)]), ["view"])

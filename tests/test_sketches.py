"""Deterministic sketches (functions/sketches.py): KMV exact-below-k and
estimator known answers vs a python simulator, CMS overestimate guarantee +
exactness when collisions are impossible, partitioning invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.functions.sketches import (
    cms_frequencies,
    kmv_distinct,
)

pytestmark = pytest.mark.usefixtures("spark")


def _h48(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)


def _events(spark, rows):
    return spark.createDataFrame(rows, "grp string, val long")


def test_kmv_exact_below_k(spark):
    # 5 distinct values, k=32 -> n_min < k branch: estimate IS the count
    rows = [("a", v) for v in [1, 2, 3, 2, 1, 4, 5]]
    out = kmv_distinct(_events(spark, rows), ["grp"], "val", k=32).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.grp, r.n_min, r.kmv_est) == ("a", 5, 5.0)
    assert r.h_k == max(sorted(_h48(v) for v in [1, 2, 3, 4, 5])[:32])


def test_kmv_estimator_matches_simulator_and_is_close(spark):
    # 500 distinct values, k=128 -> estimator branch; compare to the exact
    # python KMV simulation and sanity-check the relative error (~1/sqrt(k)
    # concentration; the md5 draw is FIXED, so this can never flake -- at
    # k=32 this same corpus draws its 32nd order statistic 2.5 sigma low
    # and lands 72% high, which is the estimator working as specified)
    vals = list(range(500))
    rows = [("g", v) for v in vals]
    out = kmv_distinct(_events(spark, rows), ["grp"], "val", k=128).collect()[0]
    hs = sorted(_h48(v) for v in vals)
    h_k = hs[127]
    expect = round(127 * float(1 << 48) / h_k, 4)
    assert (out.n_min, out.h_k) == (128, h_k)
    assert out.kmv_est == expect
    assert abs(out.kmv_est - 500) / 500 < 0.3


def test_kmv_partitioning_invariance(spark):
    rows = [("g", v % 97) for v in range(1000)]
    df = _events(spark, rows)
    a = kmv_distinct(df.repartition(1), ["grp"], "val", k=16).collect()[0]
    b = kmv_distinct(df.repartition(13), ["grp"], "val", k=16).collect()[0]
    assert tuple(a) == tuple(b)


def test_cms_overestimates_and_single_key_exact(spark):
    rows = [("x", v % 7) for v in range(700)] + [("x", 1000)] * 5
    df = _events(spark, rows)
    out = {r.val: r for r in cms_frequencies(df, "val", depth=4, width=64).collect()}
    assert set(out) == {str(v) for v in range(7)} | {"1000"}
    for r in out.values():
        assert r.cms_est >= r.n_true  # CMS never underestimates
    assert out["1000"].n_true == 5


def test_cms_exact_when_no_collisions(spark):
    # 3 keys in a 256-wide sketch: the probability all 4 rows collide for
    # any pair is nil for THIS fixed deterministic hash -- estimates exact
    rows = [("x", 1)] * 10 + [("x", 2)] * 20 + [("x", 3)] * 30
    out = {
        r.val: r
        for r in cms_frequencies(_events(spark, rows), "val", depth=4, width=256).collect()
    }
    assert {(r.n_true, r.cms_est) for r in out.values()} == {(10, 10), (20, 20), (30, 30)}


def test_cms_python_simulator_equality(spark):
    import collections

    rows = [("x", v % 11) for v in range(400)]
    depth, width = 4, 16  # tiny width -> real collisions to verify against
    cells: dict[tuple[int, int], int] = collections.Counter()
    for _, v in rows:
        for j in range(depth):
            h = int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:8], 16) % width
            cells[(j, h)] += 1
    expect = {}
    for v in {v for _, v in rows}:
        expect[str(v)] = min(
            cells[(j, int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:8], 16) % width)]
            for j in range(depth)
        )
    got = {
        r.val: r.cms_est
        for r in cms_frequencies(
            _events(spark, rows), "val", depth=depth, width=width
        ).collect()
    }
    assert got == expect

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
    kmv_set_ops,
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


def _kmv_ops_sim(a_vals, b_vals, k):
    """Python mirror of kmv_set_ops for one pair: union sketch over the
    two k-min sketches, rho = common hashes inside it."""
    sa = set(sorted({_h48(v) for v in a_vals})[:k])
    sb = set(sorted({_h48(v) for v in b_vals})[:k])
    u = sorted(sa | sb)[:k]
    n_u, h_u = len(u), max(u)
    rho = sum(1 for h in u if h in sa and h in sb)
    if n_u < k:
        union_est, inter_est = float(n_u), float(rho)
    else:
        union_est = round((k - 1) * float(1 << 48) / h_u, 4)
        inter_est = round((k - 1) * float(1 << 48) / h_u * rho / n_u, 4)
    return (n_u, h_u, rho, union_est, round(rho / n_u, 4), inter_est)


def test_kmv_set_ops_exact_below_k(spark):
    # both sketches exhaustive (union distinct 5 < k) -> every estimate
    # is exact: |A u B| = 5, |A n B| = 2, J = 2/5
    rows = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [3, 4, 5]]
    out = kmv_set_ops(_events(spark, rows), "grp", "val", k=32).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b, r.n_u, r.rho) == ("a", "b", 5, 2)
    assert (r.union_est, r.jacc, r.inter_est) == (5.0, 0.4, 2.0)


def test_kmv_set_ops_matches_simulator_estimator_branch(spark):
    # 450 distinct in the union, k=64 -> estimator branch; exact equality
    # vs the python mirror + the estimate lands within KMV concentration
    # (the md5 draw is FIXED so this can never flake; the 7000-offset draw
    # sits ~2% off true -- the 0-offset draw lands 46% high, 3.6 sigma,
    # which is the same fixed-draw tail the k=32 kmv_distinct test notes)
    a_vals, b_vals = list(range(7000, 7300)), list(range(7150, 7450))
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    r = kmv_set_ops(_events(spark, rows), "grp", "val", k=64).collect()[0]
    assert (
        r.n_u, r.h_u, r.rho, r.union_est, r.jacc, r.inter_est
    ) == _kmv_ops_sim(a_vals, b_vals, 64)
    assert abs(r.union_est - 450) / 450 < 0.1
    assert abs(r.inter_est - 150) / 150 < 0.1


def test_kmv_set_ops_all_pairs_and_partitioning_invariance(spark):
    # 3 groups -> 3 pairs; disjoint pair has rho 0 / jacc 0; result is
    # invariant to input partitioning (the sketch property)
    rows = (
        [("a", v) for v in range(40)]
        + [("b", v) for v in range(20, 60)]
        + [("c", v) for v in range(1000, 1040)]
    )
    df = _events(spark, rows)
    out1 = {
        (r.type_a, r.type_b): tuple(r)
        for r in kmv_set_ops(df.repartition(1), "grp", "val", k=16).collect()
    }
    out2 = {
        (r.type_a, r.type_b): tuple(r)
        for r in kmv_set_ops(df.repartition(11), "grp", "val", k=16).collect()
    }
    assert out1 == out2
    assert set(out1) == {("a", "b"), ("a", "c"), ("b", "c")}
    for pair in [("a", "c"), ("b", "c")]:
        sim = _kmv_ops_sim(
            range(40) if pair[0] == "a" else range(20, 60),
            range(1000, 1040),
            16,
        )
        assert out1[pair][2:] == sim
        assert out1[pair][4] == 0  # rho: no common hashes across disjoint sets


def test_hist_quantiles_known_answers_and_bound(spark):
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        hist_quantiles,
    )

    # values 1..100 over [0, 128), 7 bits -> bin width 1: bins are the
    # values themselves, so estimates equal ceil-rank quantiles + 1 edge
    rows = [("g", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, value double")
    r = hist_quantiles(
        df, ["grp"], "value", lo=0.0, hi=128.0, bits=7, qs=(50, 95)
    ).collect()[0]
    # ceil(0.5*100)=50th value = 50 -> bin 50, upper edge 51
    # ceil(0.95*100)=95th value = 95 -> bin 95, upper edge 96
    assert (r.n, r.bin_p50, r.bin_p95) == (100, 50, 95)
    assert (r.est_p50, r.est_p95) == (51.0, 96.0)
    # guarantee: true quantile inside the bin -> est overshoots < 1 width
    assert 50 <= r.est_p50 - 0.0 <= 51 and 95 <= r.est_p95 <= 96


def test_hist_quantiles_clamps_and_partitioning_invariance(spark):
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        hist_quantiles,
    )

    rows = [("g", -5.0)] * 10 + [("g", 7.0)] * 10 + [("g", 999.0)] * 10
    df = spark.createDataFrame(rows, "grp string, value double")
    out1 = hist_quantiles(
        df.repartition(1), ["grp"], "value", lo=0.0, hi=16.0, bits=4
    ).collect()[0]
    out2 = hist_quantiles(
        df.repartition(7), ["grp"], "value", lo=0.0, hi=16.0, bits=4
    ).collect()[0]
    assert tuple(out1) == tuple(out2)
    # -5 clamps to bin 0, 999 clamps to bin 15; p50 falls in the 7.0 bin
    assert (out1.bin_p50, out1.bin_p95) == (7, 15)
    assert (out1.est_p50, out1.est_p95) == (8.0, 16.0)


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


def _docsdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bloom_python(doc_rows, eval_texts, m, k, n=4):
    """Simulator mirroring bloom_decontam: distinct word n-grams, k
    md5-derived bits, flagged iff all k distinct j positions are set."""
    def grams(text):
        t = text.lower().strip().split(" ")
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    def bit(j, g):
        return int(hashlib.md5(f"{j}:{g}".encode()).hexdigest()[:12], 16) % m

    bits = {bit(j, g) for txt in eval_texts for g in grams(txt) for j in range(k)}
    out = {}
    for doc_id, text in doc_rows:
        gs = grams(text)
        if not gs:
            continue
        flagged = sum(
            1 for g in gs if all(bit(j, g) in bits for j in range(k))
        )
        out[doc_id] = (len(gs), flagged)
    return out


def test_bloom_no_false_negatives_and_superset_of_exact(spark):
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        bloom_decontam,
    )
    from medical_doc_knowledge_graph_system_spark.functions.textfns import (
        eval_suite_grams,
        ngram_decontam_against,
    )

    eval_docs = _docsdf(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docsdf(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # 2 contaminated grams
            (2, "nothing shared here at all friends"),
            (3, "x y"),  # < n tokens: no grams, absent from output
        ],
    )
    got = {
        r.doc_id: (r.n_grams, r.n_flagged)
        for r in bloom_decontam(train, eval_suite_grams(eval_docs)).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (3, 2) and got[2] == (3, 0)
    exact = {
        r.doc_id: r.n_shared_ngrams
        for r in ngram_decontam_against(train, eval_suite_grams(eval_docs)).collect()
    }
    for d, n in exact.items():
        assert got[d][1] >= n  # Bloom can only over-flag


def test_bloom_tiny_filter_matches_simulator_with_real_fps(spark):
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        bloom_decontam,
    )
    from medical_doc_knowledge_graph_system_spark.functions.textfns import (
        eval_suite_grams,
    )

    # m=64 over ~50 eval grams -> the filter saturates and innocent grams
    # collide: the simulator must agree bit-for-bit, FPs included
    eval_rows = [(1000 + i, " ".join(f"e{i}w{j}" for j in range(8))) for i in range(10)]
    train_rows = [(i, " ".join(f"t{i}x{j}" for j in range(9))) for i in range(20)]
    got = {
        r.doc_id: (r.n_grams, r.n_flagged)
        for r in bloom_decontam(
            _docsdf(spark, train_rows),
            eval_suite_grams(_docsdf(spark, eval_rows)),
            m=64,
            k=2,
        ).collect()
    }
    expect = _bloom_python(train_rows, [t for _, t in eval_rows], m=64, k=2)
    assert got == expect
    assert sum(f for _, f in got.values()) > 0  # saturation produced FPs


def test_bloom_bits_bounded_by_m(spark):
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        bloom_bits,
    )
    from medical_doc_knowledge_graph_system_spark.functions.textfns import (
        eval_suite_grams,
    )

    rows = [(i, " ".join(f"w{i}g{j}" for j in range(30))) for i in range(40)]
    bits = bloom_bits(eval_suite_grams(_docsdf(spark, rows)), m=128, k=4)
    vals = [r.bit for r in bits.collect()]
    assert len(vals) == len(set(vals)) <= 128
    assert all(0 <= v < 128 for v in vals)


def _hll_python(values):
    """Exact python simulation of hll_distinct's register/rank/estimate."""
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[:2], 16) % 64
        suffix = h[2:17]
        stripped = suffix.lstrip("0")
        z = len(suffix) - len(stripped)
        if not stripped:
            extra = 0
        else:
            nib = int(stripped[0], 16)
            extra = 0 if nib >= 8 else 1 if nib >= 4 else 2 if nib >= 2 else 3
        rank = z * 4 + extra + 1
        regs[reg] = max(regs.get(reg, 0), rank)
    sum_q = sum(int(2.0 ** (56 - m)) for m in regs.values() if m <= 56)
    denom = sum_q + (64 - len(regs)) * (1 << 56)
    raw = 0.709 * 4096.0 * 7.2057594037927936e16 / denom
    zero = 64 - len(regs)
    import math

    if zero > 0 and raw <= 160.0:
        return round(64.0 * math.log(64.0 / zero), 4), len(regs)
    return round(raw, 4), len(regs)


def test_hll_matches_simulator_and_is_close(spark):
    """Register-exact vs the python simulation on both branches: a small
    group (linear counting) and a large one (raw HLL); estimate within the
    ~13% (1.04/sqrt(64)) standard error x3 of the truth."""
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        hll_distinct,
    )

    small = [("s", v) for v in range(40)]
    big = [("b", v) for v in range(5000)]
    out = {
        r.grp: r
        for r in hll_distinct(
            _events(spark, small + big), ["grp"], "val"
        ).collect()
    }
    for grp, vals in (("s", range(40)), ("b", range(5000))):
        est, n_regs = _hll_python(list(vals))
        assert out[grp].hll_est == est
        assert out[grp].n_regs == n_regs
        truth = len(list(vals))
        assert abs(out[grp].hll_est - truth) / truth < 0.4
    # the big group must fill every register (raw branch), the small one
    # must not (linear-counting branch)
    assert out["b"].zero_regs == 0 and out["s"].zero_regs > 0


def test_hll_partitioning_invariance(spark):
    """The register build is an algebraic MAX groupBy — the sketch merge —
    so the estimate cannot depend on how rows are partitioned."""
    from medical_doc_knowledge_graph_system_spark.functions.sketches import (
        hll_distinct,
    )

    rows = [("g", v % 700) for v in range(3000)]
    df = _events(spark, rows)
    a = hll_distinct(df.repartition(1), ["grp"], "val").collect()[0]
    b = hll_distinct(df.repartition(16, "val"), ["grp"], "val").collect()[0]
    assert (a.hll_est, a.n_regs, a.denom_q) == (b.hll_est, b.n_regs, b.denom_q)

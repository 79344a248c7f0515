"""Eleventh-session r5 operators: SQ8 embedding quantization (numpy
reference equality + constant-dimension edge), RFM segmentation (python
rank reference + quintile boundary property), and the TPC-H shape
boundaries (Q13 zero-order bucket, Q15 exact tie, Q18 threshold edge,
Q22 anti-join semantics)."""

from __future__ import annotations

import math

import numpy as np

import __spark_entry__ as entry


# ── sim_sq8 ──────────────────────────────────────────────────────────────────


def _write_embeddings(spark, tmp_path, vecs):
    df = spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def _sq8_ref(vecs):
    """Pure-python double-precision reference of the gate's exact formula."""
    a = np.array(vecs, dtype=np.float32).astype(np.float64)
    out = {}
    mn = a.min(axis=0)
    mx = a.max(axis=0)
    for i, row in enumerate(a):
        codes, sse = 0, 0
        for j, v in enumerate(row):
            if mx[j] > mn[j]:
                c = math.floor((v - mn[j]) / (mx[j] - mn[j]) * 255.0 + 0.5)
            else:
                c = 0
            vr = mn[j] + c * (mx[j] - mn[j]) / 255.0
            e = v - vr
            codes += c
            sse += math.floor(e * e * 1e12 + 0.5)
        out[i] = (len(row), codes, sse)
    return out


def test_sim_sq8_matches_numpy_reference(spark, tmp_path):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 6).tolist()
    # plant a CONSTANT dimension (mx == mn): code 0, zero error
    for v in vecs:
        v[3] = 0.25
    d = _write_embeddings(spark, tmp_path, vecs)
    got = {
        r.vec_id: (r.n_dims, r.code_sum, r.sse_u)
        for r in entry.queries()["sim_sq8"](spark, d).collect()
    }
    assert got == _sq8_ref([[float(np.float32(x)) for x in v] for v in vecs])


def test_sim_sq8_codes_bounded_and_extremes_exact(spark, tmp_path):
    # the dimension min must code to 0 and the max to 255; a vector that
    # IS the per-dim min everywhere reconstructs exactly (sse 0)
    vecs = [[0.0, -1.0], [1.0, 3.0], [0.5, 1.0]]
    d = _write_embeddings(spark, tmp_path, vecs)
    rows = {r.vec_id: r for r in entry.queries()["sim_sq8"](spark, d).collect()}
    assert rows[0].sse_u == 0 and rows[0].code_sum == 0  # per-dim min vector
    assert rows[1].code_sum == 510  # per-dim max vector: 255 + 255
    assert rows[1].sse_u == 0
    for r in rows.values():
        assert 0 <= r.code_sum <= 255 * r.n_dims


# ── events_rfm ───────────────────────────────────────────────────────────────


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_events_rfm_matches_python_rank_reference(spark, tmp_path):
    import datetime as dt

    # 10 users: user u has u+1 events of value 10*u on day (u % 5) + 1
    rows = []
    eid = 0
    for u in range(10):
        for k in range(u + 1):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, (u % 5) + 1, 12, 0, 0),
                    u,
                    "view",
                    float(10 * u),
                    "{}",
                )
            )
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in entry.queries()["events_rfm"](spark, d).collect()}

    anchor = dt.date(2024, 2, 1)
    agg = {
        u: (
            (anchor - dt.date(2024, 1, (u % 5) + 1)).days,
            u + 1,
            (u + 1) * 10 * u * 100,
        )
        for u in range(10)
    }
    n = len(agg)

    def score(rank):
        return 5 - ((rank - 1) * 5) // n

    r_order = sorted(agg, key=lambda u: (agg[u][0], u))
    f_order = sorted(agg, key=lambda u: (-agg[u][1], u))
    m_order = sorted(agg, key=lambda u: (-agg[u][2], u))
    for u in range(10):
        rec, fr, mon = agg[u]
        rs = score(r_order.index(u) + 1)
        fs = score(f_order.index(u) + 1)
        ms = score(m_order.index(u) + 1)
        g = got[u]
        assert (g.recency_d, g.freq, g.monetary_c) == (rec, fr, mon)
        assert (g.r_score, g.f_score, g.m_score) == (rs, fs, ms)
        assert g.segment == f"{rs}{fs}{ms}"


def test_events_rfm_quintile_boundaries(spark, tmp_path):
    import datetime as dt

    # exactly 10 users with strictly decreasing frequency: f_score must be
    # 5,5,4,4,3,3,2,2,1,1 in frequency order (2 users per quintile)
    rows = []
    eid = 0
    for u in range(10):
        for k in range(20 - u):
            rows.append(
                (eid, dt.datetime(2024, 1, 15, 12, 0, 0), u, "view", 1.0, "{}")
            )
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r.f_score for r in entry.queries()["events_rfm"](spark, d).collect()}
    assert [got[u] for u in range(10)] == [5, 5, 4, 4, 3, 3, 2, 2, 1, 1]


# ── TPC-H shape boundaries ───────────────────────────────────────────────────


def _write_tpch(spark, tmp_path, customers, orders, lineitems, suppliers=None):
    d = str(tmp_path)
    spark.createDataFrame(
        customers,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        lineitems,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    if suppliers is not None:
        spark.createDataFrame(
            suppliers, "s_suppkey bigint, s_name string, s_nationkey int,"
            " s_acctbal double"
        ).write.mode("overwrite").parquet(f"{d}/supplier.parquet")
    return d


def test_tpch_cust_dist_zero_order_customers_counted(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(1997, 1, 1)
    # c1: 2 non-urgent orders; c2: only an URGENT order (filtered -> 0);
    # c3: no orders at all (preserved by the outer join -> 0)
    d = _write_tpch(
        spark,
        tmp_path,
        [(1, "c1", 0, 0.0, "A"), (2, "c2", 0, 0.0, "A"), (3, "c3", 0, 0.0, "A")],
        [
            (10, 1, "O", 1.0, ts, "5-LOW"),
            (11, 1, "O", 1.0, ts, "5-LOW"),
            (12, 2, "O", 1.0, ts, "1-URGENT"),
        ],
        [],
    )
    got = {r.c_count: r.custdist for r in entry.queries()["tpch_cust_dist"](spark, d).collect()}
    assert got == {2: 1, 0: 2}


def test_tpch_big_orders_threshold_is_strict(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(1997, 1, 1)
    li = lambda ok, qty: (ok, 1, 1, 1, float(qty), 100.0, 0.0, 0.0, "N", "O", ts)
    # order 10 sums to exactly 300 (excluded), order 11 to 301 (included)
    d = _write_tpch(
        spark,
        tmp_path,
        [(1, "c1", 0, 0.0, "A")],
        [(10, 1, "O", 10.0, ts, "5-LOW"), (11, 1, "O", 20.0, ts, "5-LOW")],
        [li(10, 150), li(10, 150), li(11, 150), li(11, 151)],
    )
    rows = entry.queries()["tpch_big_orders"](spark, d).collect()
    assert [(r.o_orderkey, r.sum_qty, r.odate, r.total_c) for r in rows] == [
        (11, 301, "1997-01-01", 2000)
    ]


def test_tpch_top_supplier_returns_all_ties(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(1996, 2, 1)
    li = lambda sk, price: (1, 1, sk, 1, 1.0, price, 0.0, 0.0, "N", "O", ts)
    # suppliers 1 and 2 tie at the max; supplier 3 trails
    d = _write_tpch(
        spark,
        tmp_path,
        [(1, "c1", 0, 0.0, "A")],
        [],
        [li(1, 500.0), li(2, 300.0), li(2, 200.0), li(3, 100.0)],
        suppliers=[(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
    )
    rows = sorted(
        (r.suppkey, r.s_name, r.total_rev_c)
        for r in entry.queries()["tpch_top_supplier"](spark, d).collect()
    )
    assert rows == [(1, "s1", 50000), (2, "s2", 50000)]


def test_tpch_idle_customers_anti_join_semantics(spark, tmp_path):
    import datetime as dt

    old, new = dt.datetime(1999, 1, 1), dt.datetime(2001, 1, 1)
    # all balances positive; avg = 300 cents-mean. rich = {c1: 1000, c2: 500}
    # c1 has only an OLD order (idle), c2 a RECENT one (not idle),
    # c3 below the average (never considered)
    d = _write_tpch(
        spark,
        tmp_path,
        [(1, "c1", 7, 10.0, "A"), (2, "c2", 7, 5.0, "A"), (3, "c3", 8, 0.5, "A")],
        [(10, 1, "O", 1.0, old, "5-LOW"), (11, 2, "O", 1.0, new, "5-LOW")],
        [],
    )
    rows = entry.queries()["tpch_idle_customers"](spark, d).collect()
    assert [(r.c_nationkey, r.n_custs, r.bal_sum_c) for r in rows] == [(7, 1, 1000)]


# ── text_rrf_fusion ──────────────────────────────────────────────────────────


def test_text_rrf_fusion_consistent_with_bm25_and_exact_reciprocals(spark):
    """System A of the fusion must reproduce the (independently oracled)
    bm25_topk ranking exactly, and every fused score must equal the
    integer reciprocal sum recomputed from the reported ranks."""
    from medical_doc_knowledge_graph_system_spark.functions.corpusstats import (
        bm25_topk,
    )

    d = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{d}/documents.parquet")
    fused = entry.queries()["text_rrf_fusion"](spark, d).collect()
    bm = {r.doc_id: r.rk for r in bm25_topk(docs, k=20).collect()}

    got_a = {r.doc_id: r.bm25_rk for r in fused if r.bm25_rk > 0}
    assert got_a == bm

    for r in fused:
        want = 0
        if r.bm25_rk > 0:
            want += 1000000000 // (60 + r.bm25_rk)
        if r.overlap_rk > 0:
            want += 1000000000 // (60 + r.overlap_rk)
        assert r.rrf_u == want

    order = sorted(fused, key=lambda r: (-r.rrf_u, r.doc_id))
    assert [r.fused_rk for r in order] == list(range(1, len(fused) + 1))


# ── events_survival ──────────────────────────────────────────────────────────


def test_events_survival_known_answer(spark, tmp_path):
    import datetime as dt

    def ev(eid, uid, day_first, day_last):
        return [
            (eid, dt.datetime(2024, 1, day_first, 8, 0, 0), uid, "view", 1.0, "{}"),
            (eid + 1, dt.datetime(2024, 1, day_last, 8, 0, 0), uid, "view", 1.0, "{}"),
        ]

    # horizon = Jan 30 (user 12 pushes dmax). cohort 0 = users {0,4,8,12}:
    #   u0: days 1..3   -> t=2,  death (30-3  > 3)
    #   u4: days 1..5   -> t=4,  death
    #   u8: days 1..5   -> t=4,  death
    #   u12: days 1..30 -> t=29, censored (30-30 = 0)
    rows = (
        ev(0, 0, 1, 3) + ev(10, 4, 1, 5) + ev(20, 8, 1, 5) + ev(30, 12, 1, 30)
    )
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort, r.t): (r.n_risk, r.d_t, r.haz_u)
        for r in entry.queries()["events_survival"](spark, d).collect()
    }
    # t=2: at risk 4, 1 death -> 250000; t=4: at risk 3, 2 deaths ->
    # 250000 + 666666; t=29: at risk 1, 0 deaths -> hazard flat
    assert got == {
        (0, 2): (4, 1, 250000),
        (0, 4): (3, 2, 250000 + 666666),
        (0, 29): (1, 0, 250000 + 666666),
    }


def test_events_survival_monotone(spark):
    rows = entry.queries()["events_survival"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r.t)
        for a, b in zip(rs, rs[1:]):
            assert a.n_risk > b.n_risk  # strictly fewer at risk later
            assert a.haz_u <= b.haz_u  # hazard accumulates


# ── sample_neyman ────────────────────────────────────────────────────────────


def test_sample_neyman_allocation_and_draw_match_python(spark, tmp_path):
    import datetime as dt
    import hashlib

    # stratum A: constant value (variance 0 -> weight 0, zero seats);
    # B: values alternate 0/2 ; C: values alternate 0/4 (double stddev)
    rows = []
    eid = 0
    for st, vals in [("a", [5.0] * 40), ("b", [0.0, 2.0] * 20), ("c", [0.0, 4.0] * 20)]:
        for v in vals:
            rows.append((eid, dt.datetime(2024, 1, 5, 9, 0, 0), eid % 7, st, v, "{}"))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    got = entry.queries()["sample_neyman"](spark, d).collect()

    import math

    def w_u(vals):
        n = len(vals)
        xc = [math.floor(v * 100.0 + 0.5) for v in vals]
        s1, s2 = sum(xc), sum(x * x for x in xc)
        num = n * s2 - s1 * s1
        return math.floor(n * math.sqrt(num / (n * (n - 1))) * 1e6 + 0.5)

    wa, wb, wc = w_u([5.0] * 40), w_u([0.0, 2.0] * 20), w_u([0.0, 4.0] * 20)
    # same n, doubled spread -> ~2x weight (up to 1 micro-unit: the two
    # floors quantize independently); the zero-variance stratum weighs 0
    assert wa == 0 and abs(wc - 2 * wb) <= 1
    w_tot = wa + wb + wc
    base = {s: (500 * w) // w_tot for s, w in [("a", wa), ("b", wb), ("c", wc)]}
    rem = {s: (500 * w) % w_tot for s, w in [("a", wa), ("b", wb), ("c", wc)]}
    bonus = 500 - sum(base.values())
    order = sorted(rem, key=lambda s: (-rem[s], s))
    alloc = {s: base[s] + (1 if order.index(s) < bonus else 0) for s in base}

    got_alloc = {}
    got_ids: dict[str, set[int]] = {}
    for r in got:
        got_alloc[r.event_type] = r.alloc
        got_ids.setdefault(r.event_type, set()).add(r.event_id)
    # stratum a allocates 0 seats -> absent from the sample entirely
    assert "a" not in got_alloc
    assert got_alloc == {s: alloc[s] for s in ("b", "c")}

    # the draw is the md5 bottom-alloc per stratum (capped by stratum size)
    ids = {"b": range(40, 80), "c": range(80, 120)}
    for s in ("b", "c"):
        want = sorted(
            ids[s], key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[: min(alloc[s], 40)]
        assert got_ids[s] == set(want)
        assert len(got_ids[s]) == min(alloc[s], 40)


# ── events_gini ──────────────────────────────────────────────────────────────


def test_events_gini_equality_and_extremes(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(2024, 1, 10, 9, 0, 0)

    # perfectly equal spend -> gini 0
    rows = [(i, ts, i, "view", 7.0, "{}") for i in range(8)]
    d = _write_events(spark, tmp_path / "eq", rows)
    r = entry.queries()["events_gini"](spark, d).collect()[0]
    assert (r.n_users, r.gini_u) == (8, 0)

    # one user holds all positive spend, the rest ~0 is impossible with
    # cents>=1, so use 1-cent floors: spends [1,1,1,9997] -> exact formula
    rows = [(0, ts, 0, "view", 0.01, "{}"), (1, ts, 1, "view", 0.01, "{}"),
            (2, ts, 2, "view", 0.01, "{}"), (3, ts, 3, "view", 99.97, "{}")]
    d = _write_events(spark, tmp_path / "sk", rows)
    r = entry.queries()["events_gini"](spark, d).collect()[0]
    n, total = 4, 1 + 1 + 1 + 9997
    s1 = 1 * 1 + 2 * 1 + 3 * 1 + 4 * 9997
    want = ((2 * s1 - (n + 1) * total) * 1000000) // (n * total)
    assert r.gini_u == want
    assert 700000 < r.gini_u < 760000  # near-maximal concentration


# ── kg_mention_contexts ──────────────────────────────────────────────────────


def test_kg_mention_contexts_windows(spark, tmp_path):
    # 'join' at pos 0 (empty left), 'table' mid, 'spark' at the end
    # (empty right); 'xx yy zz' are never gazetteer terms
    text = "join aa bb cc table dd ee ff gg spark"
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        (r.pos, r.term): (r.label, r.left_ctx, r.right_ctx)
        for r in entry.queries()["kg_mention_contexts"](spark, d).collect()
    }
    assert got == {
        (0, "join"): ("Operator", "", "aa bb cc"),
        (4, "table"): ("Structure", "aa bb cc", "dd ee ff"),
        (9, "spark"): ("System", "ee ff gg", ""),
    }


# ── stream_outer_join ────────────────────────────────────────────────────────


def test_stream_outer_join_emits_unmatched_and_multiplicity(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 10, 9, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: view with ONE purchase inside the 2h window
        (0, at(0), 1, "view", 1.0, "{}"),
        (1, at(30), 1, "purchase", 1.0, "{}"),
        # u2: purchase 3h after the view -> outside the window -> -1
        (2, at(0), 2, "view", 1.0, "{}"),
        (3, at(180), 2, "purchase", 1.0, "{}"),
        # u3: TWO purchases inside the window -> two emitted rows
        (4, at(0), 3, "view", 1.0, "{}"),
        (5, at(10), 3, "purchase", 1.0, "{}"),
        (6, at(20), 3, "purchase", 1.0, "{}"),
        # u4: purchase BEFORE the view -> unmatched
        (7, at(60), 4, "view", 1.0, "{}"),
        (8, at(0), 4, "purchase", 1.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = sorted(
        (r.user_id, r.view_us, r.purch_us)
        for r in entry.queries()["stream_outer_join"](spark, d).collect()
    )

    def us(minutes):
        return int((t0 + dt.timedelta(minutes=minutes)).timestamp() * 1e6)

    assert got == [
        (1, us(0), us(30)),
        (2, us(0), -1),
        (3, us(0), us(10)),
        (3, us(0), us(20)),
        (4, us(60), -1),
    ]


# ── sim_sq8_rerank ───────────────────────────────────────────────────────────


def test_sim_sq8_rerank_recall_vs_exact(spark):
    """The quantized coarse pass + exact rerank must (a) agree with the
    exact brute-force top-k on every pair both return (identical rounded
    cosine), and (b) recover most of the exact top-5 — SQ8 at 64 dims
    loses little ranking signal, and the m=50 coarse pool is 10% of the
    sf0.001 corpus."""
    from medical_doc_knowledge_graph_system_spark.functions.simsearch import (
        topk_cosine,
    )
    import __spark_entry__ as e

    d = "/root/testdata/sf0.001"
    emb = e._dbl_emb(spark.read.parquet(f"{d}/embeddings.parquet"))
    queries = emb.where("vec_id < 5").selectExpr(
        "vec_id AS query_id", "embedding AS q_embedding"
    )
    exact = {
        (r.query_id, r.vec_id): r.score
        for r in topk_cosine(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id): r.score
        for r in e.queries()["sim_sq8_rerank"](spark, d).collect()
    }
    common = set(exact) & set(got)
    for key in common:
        assert exact[key] == got[key]  # identical rounded cosine
    recall = len(common) / len(exact)
    assert recall >= 0.8, f"recall@5 {recall}"


# ── events_cohort_ltv / events_top_paths ─────────────────────────────────────


def test_events_cohort_ltv_known_answer(spark, tmp_path):
    import datetime as dt

    # users 1,2 first appear in week of Jan 1 (epoch-week W); user 3 a
    # week later. Revenue: u1 spends 1.00 in W and 2.00 in W+1;
    # u2 spends 3.00 in W; u3 spends 5.00 in W+1.
    W = (int(dt.datetime(2024, 1, 3, tzinfo=dt.timezone.utc).timestamp()) // 86400) // 7
    rows = [
        (0, dt.datetime(2024, 1, 3, 9, 0), 1, "purchase", 1.00, "{}"),
        (1, dt.datetime(2024, 1, 10, 9, 0), 1, "purchase", 2.00, "{}"),
        (2, dt.datetime(2024, 1, 3, 10, 0), 2, "purchase", 3.00, "{}"),
        (3, dt.datetime(2024, 1, 10, 11, 0), 3, "purchase", 5.00, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort_w, r.age_w): (r.n_users, r.rev_c, r.cum_rev_c, r.ltv_u)
        for r in entry.queries()["events_cohort_ltv"](spark, d).collect()
    }
    assert got == {
        (W, 0): (2, 400, 400, 400 * 1000000 // 2),
        (W, 1): (2, 200, 600, 600 * 1000000 // 2),
        (W + 1, 0): (1, 500, 500, 500 * 1000000),
    }


def test_events_top_paths_order_and_ties(spark, tmp_path):
    import datetime as dt

    def basket(eid0, uid, day, types):
        return [
            (eid0 + i, dt.datetime(2024, 1, day, 9, i, 0), uid, t, 1.0, "{}")
            for i, t in enumerate(types)
        ]

    rows = (
        basket(0, 1, 1, ["view", "click", "purchase"])
        + basket(10, 2, 1, ["view", "click", "purchase"])
        + basket(20, 1, 2, ["view", "view"])
        + basket(30, 3, 1, ["signup"])
    )
    d = _write_events(spark, tmp_path, rows)
    got = [
        (r.path, r.n_baskets, r.rk)
        for r in sorted(
            entry.queries()["events_top_paths"](spark, d).collect(),
            key=lambda r: r.rk,
        )
    ]
    # count desc, then path asc on the 1-count ties
    assert got == [
        ("view>click>purchase", 2, 1),
        ("signup", 1, 2),
        ("view>view", 1, 3),
    ]

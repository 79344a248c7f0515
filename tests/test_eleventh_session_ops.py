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

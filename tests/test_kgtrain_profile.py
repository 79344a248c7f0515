"""Late-r5 batch 2: filtered KG negative sampling (python-simulator
equality, filter guarantees, partitioning invariance), one-pass column
profiling (known answer with planted nulls, type guard, single-scan plan),
and the latest-wins struct-max == window-top-1 identity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.functions.profiling import (
    profile_columns,
)
from medical_doc_knowledge_graph_system_spark.operators.kgtrain import (
    negative_samples,
)

TRIPLES = [
    ("python", "used_for", "ml"),
    ("python", "used_for", "web"),
    ("rust", "used_for", "systems"),
    ("ml", "runs_on", "gpu"),
    ("web", "runs_on", "server"),
]


def _simulate(triples, k):
    ents = sorted({t[0] for t in triples} | {t[2] for t in triples})
    true = set(triples)
    out = set()
    for s, p, o in triples:
        for i in range(k):
            h = hashlib.md5(f"{s}|{p}|{o}|{i}".encode()).hexdigest()
            neg = ents[int(h[:12], 16) % len(ents)]
            if neg != s and neg != o and (s, p, neg) not in true:
                out.add((s, p, o, i, neg))
    return out


def test_negative_samples_matches_python_simulator(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    got = {
        (r.subj, r.pred, r.obj, r.neg_k, r.neg_obj)
        for r in negative_samples(df, k=7).collect()
    }
    assert got == _simulate(TRIPLES, 7)
    assert got  # non-vacuous


def test_negative_samples_filter_guarantees_and_invariance(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    rows = negative_samples(df, k=5).collect()
    true = set(TRIPLES)
    for r in rows:
        assert r.neg_obj != r.subj and r.neg_obj != r.obj
        assert (r.subj, r.pred, r.neg_obj) not in true
    # split membership is a pure function of the triple key: any
    # partitioning of the input produces the identical sample
    re8 = negative_samples(df.repartition(8), k=5).collect()
    key = lambda r: (r.subj, r.pred, r.obj, r.neg_k, r.neg_obj)
    assert sorted(map(key, re8)) == sorted(map(key, rows))


def test_profile_columns_known_answer_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 10), (3, "b", None), (4, "a", 30)],
        "id long, s string, v long",
    )
    got = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["s"].n_null, got["s"].n_distinct) == (1, 2)
    assert (got["s"].min_v, got["s"].max_v) == ("a", "b")
    assert (got["v"].n_null, got["v"].n_distinct) == (1, 2)
    # min/max computed in the NATIVE type then cast: numeric, not lexical
    assert (got["v"].min_v, got["v"].max_v) == ("10", "30")
    assert (got["id"].n_null, got["id"].n_distinct) == (0, 4)


def test_profile_columns_rejects_float_and_scans_once(spark, tmp_path):
    from medical_doc_knowledge_graph_system_spark.plans.checks import (
        physical_plan_string,
    )

    df = spark.createDataFrame([(1, 0.5)], "id long, x double")
    try:
        profile_columns(df, ["x"])
        raise AssertionError("float column must be rejected")
    except ValueError:
        pass
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], "id long, s string"
    ).write.parquet(p)
    prof = profile_columns(spark.read.parquet(p))
    assert physical_plan_string(prof).count("Scan parquet") == 1
    assert {r.col_name for r in prof.collect()} == {"id", "s"}


def test_latest_wins_struct_max_equals_window_top1(spark):
    rows = [
        (1, "click", "2024-01-01 00:00:00", 10, 1.0),
        (1, "click", "2024-01-02 00:00:00", 11, 2.0),
        (1, "click", "2024-01-02 00:00:00", 12, 3.0),  # ts tie -> max id
        (2, "view", "2024-01-01 00:00:00", 13, 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    m = (
        ev.groupBy("user_id", "event_type")
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("m"))
        .select("user_id", "event_type", "m.ts", "m.event_id", "m.value")
    )
    got = {(r.user_id, r.event_type): (r.event_id, r.value) for r in m.collect()}
    assert got == {(1, "click"): (12, 3.0), (2, "view"): (13, 4.0)}

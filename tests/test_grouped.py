"""Arrow grouped-transform surfaces (operators/grouped.py): ECDF ranks
(known answer, window equality, partitioning invariance) and the cogroup
views-before-purchase merge (strict-< tie handling, empty cogroup sides)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from medical_doc_knowledge_graph_system_spark.operators.grouped import (
    ecdf_ranks,
    views_before_purchase,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_ecdf_known_answer_and_window_equality(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-02 00:00:00", 1, "view", 0.0),
            (2, "2024-01-01 00:00:00", 1, "view", 0.0),
            (3, "2024-01-01 00:00:00", 1, "view", 0.0),  # ts tie -> id order
            (4, "2024-01-05 00:00:00", 2, "view", 0.0),
        ],
    )
    got = {
        (r.user_id, r.event_id): (r.rnk, r.n)
        for r in ecdf_ranks(ev, "user_id", ["ts", "event_id"]).collect()
    }
    assert got == {
        (1, 2): (1, 3),
        (1, 3): (2, 3),
        (1, 1): (3, 3),
        (2, 4): (1, 1),
    }
    # partitioning invariance: the per-group transform sorts internally, so
    # input partitioning / order must not matter
    got8 = {
        (r.user_id, r.event_id): (r.rnk, r.n)
        for r in ecdf_ranks(
            ev.repartition(8), "user_id", ["ts", "event_id"]
        ).collect()
    }
    assert got8 == got
    # equality with the window formulation on real-shaped data
    ev2 = _ev(
        spark,
        [(i, f"2024-01-{(i % 27) + 1:02d} 00:00:00", i % 5, "view", 0.0) for i in range(200)],
    )
    win = ev2.select(
        "user_id",
        "event_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long")
        .alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .cast("long")
        .alias("n"),
    )
    k = lambda r: (r.user_id, r.event_id, r.rnk, r.n)
    assert sorted(
        map(k, ecdf_ranks(ev2, "user_id", ["ts", "event_id"]).collect())
    ) == sorted(map(k, win.collect()))


def test_views_before_purchase_strict_ties_and_empty_sides(spark):
    ev = _ev(
        spark,
        [
            # user 1: two views then a purchase; one view EXACTLY AT the
            # purchase ts (strict < -> not counted)
            (1, "2024-01-01 00:00:00", 1, "view", 0.0),
            (2, "2024-01-02 00:00:00", 1, "view", 0.0),
            (3, "2024-01-03 00:00:00", 1, "view", 0.0),
            (4, "2024-01-03 00:00:00", 1, "purchase", 9.0),
            (5, "2024-01-04 00:00:00", 1, "purchase", 9.0),
            # user 2: purchase with NO views (empty view cogroup side)
            (6, "2024-01-01 00:00:00", 2, "purchase", 9.0),
            # user 3: views only (empty purchase side -> no output rows)
            (7, "2024-01-01 00:00:00", 3, "view", 0.0),
        ],
    )
    got = {
        (r.user_id, r.event_id): r.n_views_before
        for r in views_before_purchase(ev).collect()
    }
    assert got == {(1, 4): 2, (1, 5): 3, (2, 6): 0}
    # regression: under .count() Catalyst prunes harder and the self-cogroup
    # attribute dedup used to drop the purchase-side ts from the UDF input
    assert views_before_purchase(ev).count() == 3

"""N-step conversion funnel over an event stream.

The canonical product-analytics sequential-pattern operator (the batch
analogue of what event warehouses call a funnel / windowFunnel): for each
user, match the earliest strictly-increasing timestamp chain through the
ordered step list — step i's match is the user's first step-i event AFTER
the step i-1 match. Greedy-earliest matching is the standard funnel
semantics and is exactly SQL-expressible (one sequential min-aggregate per
step), so the whole operator stays JVM-side and oracle-able.

Scale shape: one pass to project/filter the event table, then per step ONE
equi-join on the user key (the per-step frame only ever SHRINKS — step i's
users are a subset of step i-1's) + one algebraic min aggregate whose
map-side partials absorb per-user event skew. No windows over the full
event set, no self-join of events with events: the join left side is
events filtered to one step type, the right side is the per-user match
frame (|users| rows). At 100 TB the step joins all shuffle on the same
user key, so AQE reuses the exchange layout across steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_sec: int | None = None,
) -> DataFrame:
    """Match the ordered ``steps`` chain per user.

    Returns one row per user who completed at least step 0:
    (user_col, stage, t_0 .. t_{n-1}) where stage in [1, n] is the number
    of completed steps and t_i is the timestamp matched for step i (NULL
    past the reached stage). Strictly-increasing timestamps: a step event
    at exactly the previous match's timestamp does NOT advance the funnel
    (the same event can never satisfy two steps).

    ``max_gap_sec`` adds the windowFunnel-style conversion bound: step i
    must land within (t_{i-1}, t_{i-1} + gap]. The matching stays
    greedy-earliest — step i-1's match is fixed before step i is sought,
    so a chain that would only complete from a LATER step-(i-1) event
    does not count (the same deterministic semantics as the unbounded
    funnel, and exactly one min-aggregate per step either way).
    """
    if len(steps) < 2:
        raise ValueError("funnel requires >= 2 steps")
    ev = events.select(user_col, type_col, ts_col)
    cur = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        prev_t = f"t_{i - 1}"
        cond = F.col(ts_col) > F.col(prev_t)
        if max_gap_sec is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col(prev_t) + F.expr(f"INTERVAL {max_gap_sec} SECOND")
            )
        nxt = (
            ev.where(F.col(type_col) == step)
            .join(cur.select(user_col, prev_t), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    stage = F.lit(1)
    for i in range(1, len(steps)):
        stage = stage + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    return cur.select(
        user_col,
        stage.cast("int").alias("stage"),
        *[f"t_{i}" for i in range(len(steps))],
    )


def position_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion: str = "purchase",
) -> DataFrame:
    """U-shaped (position-based 40/20/40) multi-touch attribution: for
    every converting (user, day) journey — the day contains at least one
    `conversion` event — credit 0.4 to the first touch, 0.4 to the last,
    and 0.2 split across the middles; single-touch journeys take 1.0,
    two-touch 0.5/0.5.

    Credit lives in exact integer micro-units: first/last get 400000,
    each middle gets 200000 div (n−2) (truncating div == floor on
    non-negative operands, both engines) — the per-channel sums are
    order-free BIGINTs and the one /1e6 at the end is the only float.
    Journey order is the deterministic (ts, event_id) total order.

    Returns (channel, n_touches, credit) — credit unrounded.
    """
    day = F.to_date(ts_col)
    wj = Window.partitionBy(user_col, day)
    wo = wj.orderBy(ts_col, id_col)
    m = df.select(
        F.col(type_col).alias("channel"),
        F.row_number().over(wo).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wj).cast("long").alias("n"),
        F.sum(F.when(F.col(type_col) == conversion, 1).otherwise(0))
        .over(wj)
        .cast("long")
        .alias("n_conv"),
    ).where(F.col("n_conv") >= 1)
    credit_u = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(400000))
        .otherwise(F.expr("200000 div (n - 2)"))
        .cast("long")
    )
    # n == 2 -> both rows are first-or-last at 400000: rescale to 500000
    credit_u = F.when(F.col("n") == 2, F.lit(500000).cast("long")).otherwise(
        credit_u
    )
    g = m.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(credit_u).cast("long").alias("credit_u"),
    )
    return g.select(
        "channel",
        "n_touches",
        (F.col("credit_u") / F.lit(1000000.0)).alias("credit"),
    )

"""Distributed as-of (point-in-time) join.

The reference has no temporal join surface; this is part of the
training-pipeline extension set (event attribution, feature point-in-time
correctness). Semantics match the classic backward as-of join — for every
left row, attach the single right row with the greatest right timestamp
satisfying ``right_ts <= left_ts`` (exact-timestamp matches allowed) within
the same equality keys, optionally bounded by ``tolerance`` seconds — i.e.
pandas ``merge_asof(direction='backward')`` / DuckDB ``ASOF LEFT JOIN``.

Implementation is the UNION + WINDOW shape, not a per-row lookup:

  tag right rows 0 / left rows 1 -> union on (keys, ts, tag) ->
  one window per key ordered (ts, tag, tiebreak) ->
  last_value(right payload, ignorenulls) over unbounded-preceding ->
  keep the left rows.

That is exactly ONE shuffle on the equality keys (the window partition) —
the plan a 1000-executor cluster wants: no broadcast of a potentially huge
right side, no range-explode, no driver lookup table, and both inputs
stream through a single sort-merge pass per key group. Skewed keys behave
like any other wide window: AQE splits stragglers, and a hot key costs one
sorted partition, not a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    tolerance: float | None = None,
    tiebreak: str | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join (``direction``: "backward" matches the greatest
    ``right_ts <= left_ts``, "forward" the smallest ``right_ts >=
    left_ts``; exact-timestamp matches qualify in both).

    Returns every ``left`` row with its columns unchanged, plus
    ``prefix + c`` for each right payload column ``c`` and
    ``prefix + right_ts`` (the matched right timestamp) — all NULL when no
    right row qualifies. ``tolerance`` (seconds, timestamp inputs compared
    at microsecond precision) drops matches further than that from
    ``left_ts`` in the match direction. ``tiebreak`` makes
    equal-timestamp right rows deterministic (the greatest tiebreak value
    wins); required for an exact oracle when (keys, right_ts) is not
    unique.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    keys = list(on)
    pay = payload if payload is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    overlap = set(f"{prefix}{c}" for c in pay + [right_ts]) & set(left.columns)
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {sorted(overlap)}")

    r_struct = F.struct(
        *[F.col(c) for c in pay], F.col(right_ts).alias("__rts")
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType
    tb_col = (
        F.col(tiebreak) if tiebreak is not None else F.lit(0)
    )
    tb_type = (
        right.select(tb_col.alias("t")).schema["t"].dataType
        if tiebreak is not None
        else None
    )

    build = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__probe"),
        (tb_col if tiebreak is not None else F.lit(0)).alias("__tb"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    probe = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__probe"),
        (F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0)).alias("__tb"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    # builds sort before probes at an equal timestamp (__probe 0 < 1), so
    # exact-time matches are visible to the probe; among equal-ts builds the
    # greatest tiebreak is last and wins last_value. Forward direction is
    # the same scan over reversed time: descending __ts makes "the next
    # right row at-or-after the probe" the last non-null behind it.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__probe").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        probe.unionByName(build)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__probe") == 1)
    )
    if tolerance is not None:
        # timestamp/timestamp_ntz subtraction yields a day-time interval
        # (microsecond-exact, timezone-free — no double cast exists for NTZ);
        # numeric timestamps compare directly in their own unit.
        ts_kind = matched.schema["__ts"].dataType.typeName()
        if direction == "backward":
            gap = F.col("__ts") - F.col("__m.__rts")
        else:
            gap = F.col("__m.__rts") - F.col("__ts")
        if ts_kind in ("timestamp", "timestamp_ntz"):
            in_tol = gap <= F.expr(f"make_dt_interval(0, 0, 0, {float(tolerance)})")
        else:
            in_tol = gap <= F.lit(float(tolerance))
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in pay]
    out_cols.append(F.col("__m.__rts").alias(f"{prefix}{right_ts}"))
    return matched.select(*out_cols)

"""Scalable point-in-interval (range) join.

The reference's single-box engine can answer "which events fall inside
this window" with an index scan; Spark has no native range-join
optimization (open-source Catalyst plans `p.ts BETWEEN i.begin AND i.end`
as a broadcast nested-loop or, worse, a cartesian product + filter). The
standard distributed shape is TIME-BUCKETING: quantize both sides to
fixed-width epoch buckets, explode each interval to every bucket it
overlaps, equi-join on (keys..., bucket), then apply the exact predicate.

Scale properties:
- the join is a plain hash equi-join on (keys, bucket) — shuffles on both
  sides, AQE-skew-splittable, never a nested loop;
- per-interval fan-out is ceil(span / bucket_s) + 1 rows, so `bucket_s`
  chosen near the typical span keeps the explode O(1) per interval;
- each point lands in exactly ONE bucket, so a matched (interval, point)
  pair is emitted exactly once — no post-join dedup;
- the exact predicate (begin <= t < end) runs AFTER the equi-join on the
  co-located pair, JVM-side.

At 100 TB the bucket key composes with the equi-keys (user_id here), so
a Zipf-headed key is further split by time — the bucketing doubles as
skew mitigation for long-running hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    keys: list[str],
    begin: str = "ts_begin",
    end: str = "ts_end",
    point_ts: str = "ts",
    bucket_s: int = 1800,
) -> DataFrame:
    """Inner-join every interval row to every point row with matching
    `keys` and begin <= point_ts < end (half-open — the watermark/window
    convention). Returns intervals' columns plus the points' non-key
    columns prefixed ``p_``.

    Bucket arithmetic is integer epoch-seconds: ``unix_timestamp`` floors
    toward -infinity, and flooring is monotone, so a point inside the
    half-open window always lands in a bucket within
    [floor(sec(begin)/W), floor(sec(end)/W)] — the exploded range covers
    every possible match and the exact predicate discards the rest.
    """
    w = int(bucket_s)
    i_bkts = F.sequence(
        F.floor(F.unix_timestamp(F.col(begin)) / w).cast("long"),
        F.floor(F.unix_timestamp(F.col(end)) / w).cast("long"),
    )
    iv = intervals.withColumn("__bkt", F.explode(i_bkts))
    p_payload = [c for c in points.columns if c not in keys]
    pt = points.select(
        *keys,
        F.floor(F.unix_timestamp(F.col(point_ts)) / w).cast("long").alias("__bkt"),
        *[F.col(c).alias(f"p_{c}") for c in p_payload],
    )
    joined = iv.join(pt, [*keys, "__bkt"]).where(
        (F.col(f"p_{point_ts}") >= F.col(begin))
        & (F.col(f"p_{point_ts}") < F.col(end))
    )
    return joined.drop("__bkt")


def interval_point_count(
    intervals: DataFrame,
    points: DataFrame,
    keys: list[str],
    interval_id: str,
    begin: str = "ts_begin",
    end: str = "ts_end",
    point_ts: str = "ts",
    bucket_s: int = 1800,
) -> DataFrame:
    """Per-interval match count, ZEROS INCLUDED: the `interval_point_join`
    pair stream aggregated by the interval's id columns, left-joined back
    onto the interval set so empty windows report 0 (the analytics
    contract — a purchase with no preceding views is a row, not a gap).

    Scale shape: the count is algebraic (map-side partials), the reattach
    is a join on the interval id — broadcastable when the interval side
    is dimension-sized, plain hash join otherwise (AQE decides).
    """
    pairs = interval_point_join(
        intervals, points, keys, begin, end, point_ts, bucket_s
    )
    counts = pairs.groupBy(interval_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return intervals.join(counts, interval_id, "left").select(
        *intervals.columns,
        F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points"),
    )


def interval_union(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key group — the uptime/billing
    sweep: total covered length, interval count, and the number of
    disjoint islands after merging overlaps.

    One window pass (the classic sweep): prev_max = running max of end
    over the (start, tiebreak) order excluding the current row; a row
    contributes max(0, end − max(start, prev_max)) and starts a new
    island when start > prev_max. START/END MUST BE INTEGERS (epoch
    seconds): every contribution is an exact BIGINT, so the total is
    order-free and engine-exact.

    Scale shape: one shuffle (the per-key window sort); state per key is
    one running max. Skewed keys inherit the window's sort cost — split
    upstream if a single key dominates.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    st = F.col(start_col).cast("long")
    en = F.col(end_col).cast("long")
    m = df.select(
        *keys,
        st.alias("st"),
        en.alias("en"),
        F.max(en).over(w).alias("prev_max"),
    )
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("en") - F.greatest(F.col("st"), F.coalesce("prev_max", F.col("st"))),
    )
    new_island = F.when(
        F.col("prev_max").isNull() | (F.col("st") > F.col("prev_max")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return m.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(new_island).cast("long").alias("n_islands"),
        F.sum(contrib).cast("long").alias("covered"),
    )

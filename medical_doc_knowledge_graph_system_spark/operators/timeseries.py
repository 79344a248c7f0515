"""Time-series regularization: dense-calendar gap fill with zero-fill and
last-observation-carried-forward (LOCF).

The resampling primitive a metrics/feature pipeline needs before any
window computation over event-derived series: sparse per-key daily
aggregates become a DENSE per-key calendar (every day between the key's
first and last observation), absent days are zero-filled and flagged, and
the last observed value is carried forward — Pandas' `resample('D') +
ffill` re-expressed as pure Catalyst (sequence + explode + left join +
one bounded window), no Python.

Scale shape: the calendar explode emits |keys| x span rows — the DENSE
series size, which is the output size (nothing is amplified); the LOCF
window partitions by key and is bounded by the key's span. No global
window, no driver loop. At 10^12 events the daily pre-aggregate (the
input here) has already collapsed volume by the per-day event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily(
    daily: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    value_col: str = "c",
) -> DataFrame:
    """Densify a (keys..., day, value) frame to every day in each key's
    [min(day), max(day)] span. Returns (keys..., day, cnt, is_gap,
    locf_cnt): cnt = value (0 on gap days), is_gap = the day had no row,
    locf_cnt = last observed value at or before the day (never null —
    each key's first day is observed by construction)."""
    span = daily.groupBy(*key_cols).agg(
        F.min(day_col).alias("__mn"), F.max(day_col).alias("__mx")
    )
    cal = span.select(
        *key_cols, F.explode(F.sequence("__mn", "__mx")).alias(day_col)
    )
    filled = cal.join(daily, [*key_cols, day_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        *key_cols,
        day_col,
        F.coalesce(F.col(value_col), F.lit(0)).cast("long").alias("cnt"),
        F.col(value_col).isNull().alias("is_gap"),
        F.last(value_col, ignorenulls=True).over(w).cast("long").alias("locf_cnt"),
    )

"""One-pass column profiling: per-column null counts, distinct counts and
min/max over an arbitrary column list — the data-quality census every
ingestion pipeline runs before (and after) a 100 TB load, and what a
warehouse optimizer's NDV statistics are built from.

Scale shape: ONE scan. All per-column aggregates live in a single
`agg(...)` — the multiple COUNT(DISTINCT) expressions plan as one Expand
(each input row fans out once per distinct-column, then one aggregation
pass); there is no per-column job, no driver loop over columns, and the
result is |columns| rows however large the table. min/max are computed in
the column's native type and cast to string only afterward (so e.g. BIGINT
min/max compare numerically, not lexically); restricted to string/integral
columns because float→string formatting is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAFE_TYPES = {"string", "bigint", "int", "smallint", "tinyint", "long"}


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_v, max_v) for each
    profiled column, one table scan total. Defaults to every string /
    integral column (see module doc for why floats are excluded)."""
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [c for c, t in df.dtypes if t in _SAFE_TYPES]
    bad = [c for c in cols if dtypes.get(c) not in _SAFE_TYPES]
    if bad:
        raise ValueError(f"unsupported column types for profile: {bad}")

    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_v"),
                F.col(f"__max_{c}").alias("max_v"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p"), "n_rows").select(
        "p.col_name", "n_rows", "p.n_null", "p.n_distinct", "p.min_v", "p.max_v"
    )

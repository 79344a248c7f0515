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


def check_suite(
    df: DataFrame,
    checks: list[tuple[str, "F.Column", "F.Column"]],
) -> DataFrame:
    """Deequ-style declarative data-validation suite: `checks` is a list
    of (name, observed_aggregate, passed_predicate_over_aggregates); ALL
    observed aggregates are computed in ONE aggregation over ONE scan
    (the Deequ/whylogs trick — a 50-constraint suite costs the same pass
    as a count), then unpivoted to one (check_name, observed, passed) row
    per constraint via stack. `passed` is evaluated AFTER aggregation, so
    it may reference any check's aggregate by its name.

    Scale shape: one scan, one single-row global aggregate (map-side
    partials collapse everything before the 1-row exchange), |checks|
    output rows. COUNT(DISTINCT) constraints share the one Expand.
    """
    agg = df.agg(
        *[obs.cast("long").alias(name) for name, obs, _ in checks]
    )
    passed = agg.select(
        *[F.col(name) for name, _, _ in checks],
        *[p.alias(f"__p_{name}") for name, _, p in checks],
    )
    parts = ", ".join(
        f"'{name}', {name}, __p_{name}" for name, _, _ in checks
    )
    return passed.selectExpr(
        f"stack({len(checks)}, {parts}) AS (check_name, observed, passed)"
    )

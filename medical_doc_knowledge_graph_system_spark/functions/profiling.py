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

import math

from pyspark.sql import DataFrame, Window
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


def simpson_diversity(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Per-key Simpson diversity index D = 1 − Σᵢ nᵢ(nᵢ−1) / (n(n−1)):
    the probability two draws WITHOUT replacement from the key's items
    differ — the ecology/domain-mix diversity measure that (unlike
    Shannon entropy) needs no logarithm, so cross-engine float parity is
    structural: both moments are exact BIGINTs and D is ONE closed-form
    division.

    The training-data use: per-source/per-shard category-mix diversity —
    a shard whose D collapses toward 0 is dominated by one domain.

    Scale shape: two hash aggregations (key×item cells, then per-key
    moments), map-side partials absorb item skew; per-key state is three
    longs regardless of item-set size. Keys with n < 2 are dropped (D is
    undefined). Output: (keys..., n_items, n, simpson) unrounded.
    """
    cells = df.groupBy(*key_cols, item_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    return simpson_from_cells(cells, key_cols)


def simpson_from_cells(cells: DataFrame, key_cols: list[str]) -> DataFrame:
    """Simpson D from a per-(key, item) count frame (``__c`` column) —
    factored out so the streaming gate can drain the SAME closed form from
    fold state (each cell count is a monotone non-decreasing streaming
    aggregate, so the drained per-cell max IS the final cell — the
    hist_estimate single-sourcing convention)."""
    c = F.col("__c")
    g = cells.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(c).cast("long").alias("n"),
        F.sum(c * (c - F.lit(1))).cast("long").alias("__pairs"),
    )
    n = F.col("n")
    d = F.lit(1.0) - F.col("__pairs").cast("double") / (
        n * (n - F.lit(1))
    ).cast("double")
    return g.where(n >= 2).select(
        *key_cols, "n_items", "n", d.alias("simpson")
    )


#: repr() round-trips doubles exactly, so these literal strings parse to
#: the identical IEEE double on Spark AND DuckDB — embed them verbatim in
#: both the column expressions and any SQL oracle.
BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def benford_firstdigit(
    df: DataFrame,
    cents_col: str,
) -> DataFrame:
    """First-significant-digit census vs Benford's law — the classic
    fraud/synthetic-data screen over any positive amount column, plus the
    χ² goodness-of-fit statistic.

    ``cents_col`` must be a positive BIGINT (quantize upstream; rows < 1
    are ignored). The first digit is taken from the decimal string of the
    BIGINT (integer→string is exact on any engine — never via log10,
    which is not correctly rounded). Digits with zero observations still
    contribute their expected-count term (the 9-row digit dimension is
    generated, not observed). Each χ² term (o−e)²/e is quantized to
    BIGINT micro-units BEFORE the 9-term sum — double sums are
    addition-order-sensitive, BIGINT sums are not — and the expected
    probabilities are repr()-literal doubles (see ``BENFORD_P``).

    Scale shape: one scan, one 9-cell hash aggregate (map-side partials),
    then constant-size (9-row) windows. Output: one row per digit
    (digit, n_obs, expected, chi2) with expected/chi2 unrounded doubles
    and chi2 identical on every row.
    """
    obs = (
        df.where(F.col(cents_col) >= 1)
        .groupBy(
            F.substring(F.col(cents_col).cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    return benford_from_obs(obs)


def benford_from_obs(obs: DataFrame) -> DataFrame:
    """The Benford census + χ² from a (digit, n_obs) frame — factored out
    so the streaming gate can drain the SAME closed form from fold state
    (digit counts are monotone streaming aggregates; drained per-digit max
    == final count)."""
    spark = obs.sparkSession
    dims = spark.createDataFrame(
        [(d, float(p)) for d, p in BENFORD_P.items()], "digit int, p double"
    )
    j = dims.join(obs, "digit", "left").select(
        "digit", "p", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs")
    )
    w_all = Window.partitionBy()
    t = j.withColumn("nn", F.sum("n_obs").over(w_all).cast("long"))
    e = F.col("nn").cast("double") * F.col("p")
    od = F.col("n_obs").cast("double")
    term_u = F.floor((od - e) * (od - e) / e * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    t = t.withColumn("__tu", term_u)
    return t.select(
        "digit",
        "n_obs",
        e.alias("expected"),
        (F.sum("__tu").over(w_all) / F.lit(1000000.0)).alias("chi2"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA over an INTEGER-quantized value column: the k-group
    generalization of the pairwise Welch gate — between/within sums of
    squares and the F statistic, from exact per-group BIGINT moments
    (nᵢ, Σc, Σc²).

    Float parity follows the events_chisq convention: each group's
    between term nᵢ(mᵢ−m)² and within correction Sᵢ²/nᵢ is ONE
    closed-form double from exact BIGINTs, quantized to BIGINT
    micro-units BEFORE the cross-group sum (double sums are addition-
    order-sensitive; BIGINT sums are not); Σc² stays exact BIGINT
    throughout. F = (SSB/(k−1)) / (SSW/(n−k)) as two fixed-order
    divisions. Callers quantize coarsely enough that Σc² · 10⁶ fits
    int64 (|c| ≲ 3·10⁴ at 10⁷ rows; rescale beyond).

    Scale shape: ONE scan, one k-row hash aggregate (map-side partials
    absorb group skew), then constant-size (k-row) windows. Output: one
    row (k, n, ssb, ssw, f_stat), floats unrounded.
    """
    c = F.col(value_col).cast("long")
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum(c).cast("long").alias("s_i"),
        F.sum(c * c).cast("long").alias("q_i"),
    )
    return anova_from_moments(g)


def anova_from_moments(g: DataFrame) -> DataFrame:
    """The ANOVA statistic from a per-group moment frame (n_i, s_i, q_i)
    — factored out so the streaming gate can drain the SAME closed form
    from fold state (each moment is a monotone non-decreasing streaming
    aggregate, so the drained per-group max IS the final moment)."""
    w_all = Window.partitionBy()
    t = g.select(
        "n_i",
        "s_i",
        "q_i",
        F.sum("n_i").over(w_all).cast("long").alias("n"),
        F.sum("s_i").over(w_all).cast("long").alias("s"),
        F.sum("q_i").over(w_all).cast("long").alias("q"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("k"),
    )
    m_i = F.col("s_i").cast("double") / F.col("n_i").cast("double")
    m = F.col("s").cast("double") / F.col("n").cast("double")
    bu = F.floor(
        F.col("n_i").cast("double") * (m_i - m) * (m_i - m) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    wu = F.floor(
        (F.col("s_i") * F.col("s_i")).cast("double")
        / F.col("n_i").cast("double")
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    u = t.select(
        "n",
        "q",
        "k",
        bu.alias("__bu"),
        wu.alias("__wu"),
    )
    agg = u.agg(
        F.max("k").alias("k"),
        F.max("n").alias("n"),
        F.sum("__bu").cast("long").alias("__ssb_u"),
        (F.max("q") * F.lit(1000000) - F.sum("__wu")).cast("long").alias(
            "__ssw_u"
        ),
    )
    f = (F.col("__ssb_u") / (F.col("k") - F.lit(1)).cast("double")) / (
        F.col("__ssw_u") / (F.col("n") - F.col("k")).cast("double")
    )
    return agg.select(
        "k",
        "n",
        (F.col("__ssb_u") / F.lit(1000000.0)).alias("ssb"),
        (F.col("__ssw_u") / F.lit(1000000.0)).alias("ssw"),
        f.alias("f_stat"),
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

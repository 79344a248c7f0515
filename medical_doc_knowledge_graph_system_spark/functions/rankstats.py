"""Distribution-free (rank-based) statistics over grouped data: two-sample
Kolmogorov-Smirnov, Kendall tau-b, Spearman rho, Kruskal-Wallis H, trimmed
means, median absolute deviation, and the Wald-Wolfowitz runs test — the
nonparametric drift/correlation screens a corpus-curation pipeline runs when
it cannot assume normality (reference runs these on extraction-quality score
distributions; cf. reference app/evaluation 'distribution comparison' notes).

Float-parity design (the repo convention): every statistic is derived from
EXACT BIGINT rank/count moments; the only floating-point work is a final
closed-form expression (divisions, one sqrt — sqrt is IEEE-correctly-rounded
on both Spark and DuckDB, so it is bit-exact cross-engine). Where a
cross-group float sum is unavoidable (Kruskal-Wallis between-term), each
group's term is micro-quantized to BIGINT BEFORE the sum (the events_anova
convention) so addition order cannot matter.

Scale shape: all operators are one scan + hash aggregates + bounded windows.
Rank windows partition by the caller's keys, never globally, except where the
statistic is itself per-group (KS cumulative walk: one window per group
pair over the distinct-value cells, not the raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_2samp_pairs(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D for every unordered pair of groups.

    D = max_x |F_a(x) - F_b(x)| over the pooled support. Computed on the
    distinct-value CELLS (value -> per-group count), so the cumulative walk
    is one window per pair over |support| rows, not |rows|. The max is taken
    over the exact BIGINT numerator |c_a*n_b - c_b*n_a| (common denominator
    n_a*n_b), so parity is structural; ONE final division.

    Scale: cells are one hash aggregate off the scan; each cell is
    replicated (k-1) times for k groups — fine for enum-like group columns.
    """
    cells = (
        df.groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = cells.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    pairs = (
        totals.select(F.col("g").alias("g1"), F.col("n").alias("n1"))
        .join(
            totals.select(F.col("g").alias("g2"), F.col("n").alias("n2")),
            F.col("g1") < F.col("g2"),
        )
    )
    sided = pairs.join(
        cells, (cells["g"] == pairs["g1"]) | (cells["g"] == pairs["g2"])
    ).select(
        "g1",
        "g2",
        "n1",
        "n2",
        "v",
        F.when(F.col("g") == F.col("g1"), F.col("c")).otherwise(F.lit(0)).alias("c1"),
        F.when(F.col("g") == F.col("g2"), F.col("c")).otherwise(F.lit(0)).alias("c2"),
    )
    merged = sided.groupBy("g1", "g2", "n1", "n2", "v").agg(
        F.sum("c1").cast("long").alias("d1"),
        F.sum("c2").cast("long").alias("d2"),
    )
    w = (
        Window.partitionBy("g1", "g2")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = merged.select(
        "g1",
        "g2",
        "n1",
        "n2",
        F.sum("d1").over(w).cast("long").alias("cum1"),
        F.sum("d2").over(w).cast("long").alias("cum2"),
    )
    num = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return (
        walked.groupBy("g1", "g2", "n1", "n2")
        .agg(F.max(num).cast("long").alias("d_num"))
        .select(
            "g1",
            "g2",
            "n1",
            "n2",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("ks_d"),
        )
    )


def kendall_tau_b(
    df: DataFrame, keys: list[str], id_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Kendall tau-b between two INTEGER columns within each key group.

    Pairwise self-join on id_col (a.id < b.id enumerates each unordered
    pair once); concordant/discordant/tie counts are exact BIGINTs;
    tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)) is one closed form whose
    sqrt is bit-exact cross-engine. Intended for bounded per-key series
    (daily aggregates): pairs are n(n-1)/2 per key.
    """
    a = df.select(
        *keys,
        F.col(id_col).alias("ia"),
        F.col(x_col).cast("long").alias("xa"),
        F.col(y_col).cast("long").alias("ya"),
    )
    b = df.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(id_col).alias("ib"),
        F.col(x_col).cast("long").alias("xb"),
        F.col(y_col).cast("long").alias("yb"),
    )
    cond = F.col("ia") < F.col("ib")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__k_{k}"))
    pr = a.join(b, cond)
    sx = F.signum((F.col("xb") - F.col("xa")).cast("double"))
    sy = F.signum((F.col("yb") - F.col("ya")).cast("double"))
    agg = pr.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(sx * sy > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(sx * sy < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).cast("long").alias("tie_x"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).cast("long").alias("tie_y"),
    )
    denom = F.sqrt(
        ((F.col("n_pairs") - F.col("tie_x")).cast("double"))
        * ((F.col("n_pairs") - F.col("tie_y")).cast("double"))
    )
    return agg.select(
        *keys,
        "n_pairs",
        "conc",
        "disc",
        ((F.col("conc") - F.col("disc")).cast("double") / denom).alias("tau_b"),
    )


def _avg_rank2(keys: list[str], col: str) -> F.Column:
    """Twice the average (mid) rank of `col` within keys — an exact BIGINT:
    2*avg_rank = first_rank + last_rank = 2*rank() + (tie_count - 1)."""
    wr = Window.partitionBy(*keys).orderBy(col)
    wt = Window.partitionBy(*keys, col)
    return (
        F.lit(2) * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - F.lit(1)
    ).cast("long")


def spearman_rho(
    df: DataFrame, keys: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation (with average ranks for ties) within each
    key group. Ranks are carried as 2*avg_rank — exact BIGINTs even for
    .5 mid-ranks — so all five Pearson moments are exact; rho is ONE
    closed form (the sqrt factors are cast to double BEFORE the multiply
    so the product cannot overflow int64)."""
    r = df.select(
        *keys,
        _avg_rank2(keys, x_col).alias("rx"),
        _avg_rank2(keys, y_col).alias("ry"),
    )
    agg = r.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
    )
    fx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return agg.select(
        *keys, "n", (num / F.sqrt(fx * fy)).alias("rho")
    )


def kruskal_wallis(
    df: DataFrame, keys: list[str], group_col: str, value_col: str
) -> DataFrame:
    """Kruskal-Wallis H (with tie correction) across `group_col` within each
    key group, over an INTEGER-quantized value column.

    Ranks come from distinct-value cells (value -> count), never a per-row
    window: 2*mid_rank(v) = 2*cum(t) - t + 1 off one cumulative window over
    the support. Each group's between-term n_g*(r̄_g - (N+1)/2)² is ONE
    closed-form double from exact BIGINTs, micro-quantized (×1000) BEFORE
    the cross-group sum (the anova_from_moments convention). The tie term
    Σ(t³ - t) stays exact BIGINT.
    """
    v = F.col(value_col).cast("long")
    cells = (
        df.groupBy(*keys, v.alias("v"), F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    vtot = cells.groupBy(*keys, "v").agg(F.sum("c").cast("long").alias("t"))
    wv = (
        Window.partitionBy(*keys)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = vtot.select(
        *keys,
        "v",
        "t",
        (F.lit(2) * F.sum("t").over(wv) - F.col("t") + F.lit(1))
        .cast("long")
        .alias("r2"),
    )
    per_g = (
        cells.join(ranked, [*keys, "v"])
        .groupBy(*keys, "g")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(F.col("c") * F.col("r2")).cast("long").alias("s2_g"),
        )
    )
    wk = Window.partitionBy(*keys)
    tot = per_g.select(
        *keys,
        "n_g",
        "s2_g",
        F.sum("n_g").over(wk).cast("long").alias("n"),
        F.count(F.lit(1)).over(wk).cast("long").alias("k"),
    )
    d_g = F.col("s2_g").cast("double") / (F.lit(2) * F.col("n_g")).cast(
        "double"
    ) - (F.col("n") + F.lit(1)).cast("double") / F.lit(2.0)
    term_u = F.floor(
        F.col("n_g").cast("double") * d_g * d_g * F.lit(1000.0) + F.lit(0.5)
    ).cast("long")
    between = tot.groupBy(*keys).agg(
        F.max("k").cast("long").alias("k"),
        F.max("n").cast("long").alias("n"),
        F.sum(term_u).cast("long").alias("b_u"),
    )
    ties = vtot.groupBy(*keys).agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie3")
    )
    j = between.join(ties, keys)
    h = (
        F.lit(12.0)
        * (F.col("b_u").cast("double") / F.lit(1000.0))
        / (F.col("n") * (F.col("n") + F.lit(1))).cast("double")
    )
    corr = F.lit(1.0) - F.col("tie3").cast("double") / (
        F.col("n") * F.col("n") * F.col("n") - F.col("n")
    ).cast("double")
    return j.select(*keys, "k", "n", h.alias("h_stat"), (h / corr).alias("h_adj"))


def trimmed_mean(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    trim_tenths: int = 1,
) -> DataFrame:
    """Two-sided trimmed mean of an INTEGER-quantized value column: drop the
    lowest and highest floor(n * trim_tenths / 10) rows per key group, then
    average the exact BIGINT sum of what remains (ONE division).

    Ties at the trim boundary need no tiebreak: rows tied in value are
    interchangeable under any rank order, so the kept multiset — and the
    sum — is order-invariant.
    """
    v = F.col(value_col).cast("long")
    wr = Window.partitionBy(*keys).orderBy(value_col)
    wk = Window.partitionBy(*keys)
    r = df.select(
        *keys,
        v.alias("v"),
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wk).cast("long").alias("n"),
    )
    cut = F.floor(F.col("n") * F.lit(int(trim_tenths)) / F.lit(10)).cast("long")
    kept = r.where((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return kept.groupBy(*keys).agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("v").cast("long").alias("sum_kept"),
        (F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "trimmed_mean"
        ),
    )


def _positional_median(
    df: DataFrame, keys: list[str], col: str, out: str
) -> DataFrame:
    """POSITIONAL median (the theilsen convention): average of the values at
    ranks floor((m+1)/2) and floor(m/2)+1. No quantization — the two picked
    doubles are bit-identical on both engines and IEEE (a+b)/2 of identical
    operands is deterministic ((a+a)/2 == a for the odd case)."""
    wr = Window.partitionBy(*keys).orderBy(col)
    wk = Window.partitionBy(*keys)
    r = df.select(
        *keys,
        F.col(col).alias("__v"),
        F.row_number().over(wr).cast("long").alias("__rn"),
        F.count(F.lit(1)).over(wk).cast("long").alias("__m"),
    )
    sel = r.where(
        (F.col("__rn") == F.floor((F.col("__m") + 1) / 2))
        | (F.col("__rn") == F.floor(F.col("__m") / 2) + 1)
    )
    return sel.groupBy(*keys).agg(
        (F.sum("__v") / F.count(F.lit(1))).alias(out),
        F.max("__m").cast("long").alias(f"{out}_n"),
    )


def median_abs_deviation(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """MAD per key group: positional median of |x - positional median(x)|.
    Both medians are positional (see _positional_median); the deviation
    |x - med| subtracts identical doubles, so every intermediate is
    bit-identical cross-engine. The k-row median frame is pinned — the
    deviation join AND the final readout both consume it (1 source scan
    total instead of 3)."""
    med = _positional_median(df, keys, value_col, "med").localCheckpoint(
        eager=True
    )
    dev = df.join(F.broadcast(med), keys).select(
        *keys,
        "med",
        F.col("med_n").alias("n"),
        F.abs(F.col(value_col) - F.col("med")).alias("adev"),
    )
    mad = _positional_median(dev, keys, "adev", "mad")
    return (
        med.join(mad.select(*keys, "mad"), keys)
        .select(*keys, F.col("med_n").alias("n"), "med", "mad")
    )


def runs_test(
    df: DataFrame, keys: list[str], order_col: str, value_col: str
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of a per-key series around
    its own (positional) median: rows equal to the median are dropped, the
    rest dichotomized, runs counted with ONE lag window, and
    z = (R - mu) / sigma with mu = 1 + 2*n1*n2/n and
    sigma² = 2*n1*n2*(2*n1*n2 - n) / (n²(n-1)) — every moment an exact
    BIGINT, z one closed form under the bit-exact sqrt."""
    med = _positional_median(df, keys, value_col, "med")
    sided = (
        df.join(F.broadcast(med.select(*keys, "med")), keys)
        .where(F.col(value_col) != F.col("med"))
        .select(
            *keys,
            F.col(order_col).alias("o"),
            F.when(F.col(value_col) > F.col("med"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("side"),
        )
    )
    wo = Window.partitionBy(*keys).orderBy("o")
    marked = sided.select(
        *keys,
        "side",
        F.when(
            F.lag("side").over(wo).isNull()
            | (F.lag("side").over(wo) != F.col("side")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    agg = marked.groupBy(*keys).agg(
        F.sum("side").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("side")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("runs"),
    )
    n = (F.col("n1") + F.col("n2")).cast("long")
    two = (F.lit(2) * F.col("n1") * F.col("n2")).cast("long")
    mu = F.lit(1.0) + two.cast("double") / n.cast("double")
    s2 = (two * (two - n)).cast("double") / (n * n * (n - F.lit(1))).cast(
        "double"
    )
    return agg.select(
        *keys,
        "n1",
        "n2",
        "runs",
        ((F.col("runs").cast("double") - mu) / F.sqrt(s2)).alias("z_runs"),
    )


def phi_pairs(df: DataFrame, group_col: str, unit_col: str) -> DataFrame:
    """Phi coefficient (Matthews correlation of the 2×2 presence table)
    for every unordered pair of groups, over shared observation units:
    unit u "has" group g if at least one (g, u) row exists. For pair
    (a, b): n11 = units with both, margins from the per-group presence
    counts, n00 from the global unit count, and

        phi = (n11*n00 − n10*n01) / sqrt((n11+n10)(n01+n00)(n11+n01)(n10+n00))

    — every cell an exact BIGINT, the 4-way product cast to double only
    under the bit-exact sqrt. The co-occurrence screen a curation
    pipeline runs between event/label types per day or per document.

    Scale shape: one distinct-cell aggregate off the scan (pinned: the
    pair join reads it twice + the margins once), a presence-set
    self-join on the unit, one k²-row aggregate.
    """
    cells = (
        df.select(F.col(group_col).alias("g"), F.col(unit_col).alias("u"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_units = cells.select("u").distinct().count()
    marg = cells.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("m"))
    both = (
        cells.alias("l")
        .join(
            cells.alias("r"),
            (F.col("l.u") == F.col("r.u")) & (F.col("l.g") < F.col("r.g")),
        )
        .groupBy(F.col("l.g").alias("g1"), F.col("r.g").alias("g2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n11"))
    )
    # pair frame over ALL group pairs (zero-overlap pairs included)
    pairs = (
        marg.select(F.col("g").alias("g1"), F.col("m").alias("m1"))
        .join(
            marg.select(F.col("g").alias("g2"), F.col("m").alias("m2")),
            F.col("g1") < F.col("g2"),
        )
        .join(both, ["g1", "g2"], "left")
        .select(
            "g1",
            "g2",
            "m1",
            "m2",
            F.coalesce("n11", F.lit(0)).cast("long").alias("n11"),
        )
    )
    n10 = (F.col("m1") - F.col("n11")).cast("long")
    n01 = (F.col("m2") - F.col("n11")).cast("long")
    n00 = (
        F.lit(int(n_units)) - F.col("m1") - F.col("m2") + F.col("n11")
    ).cast("long")
    num = (F.col("n11") * n00 - n10 * n01).cast("double")
    den = F.sqrt(
        (F.col("m1") * (F.lit(int(n_units)) - F.col("m1"))).cast("double")
        * (F.col("m2") * (F.lit(int(n_units)) - F.col("m2"))).cast("double")
    )
    # degenerate margins (a group present in ALL units or none) have no
    # defined phi — the 2x2 table has an empty row/column; emit 0.0 (the
    # integer condition keeps the guard engine-exact, never a float == 0)
    ok = (
        (F.col("m1") > 0)
        & (F.col("m1") < F.lit(int(n_units)))
        & (F.col("m2") > 0)
        & (F.col("m2") < F.lit(int(n_units)))
    )
    return pairs.select(
        "g1",
        "g2",
        "n11",
        n10.alias("n10"),
        n01.alias("n01"),
        n00.alias("n00"),
        F.when(ok, num / den).otherwise(F.lit(0.0)).alias("phi"),
    )


def mann_whitney_pairs(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Mann-Whitney rank-sum U (with tie-corrected normal z) for every
    unordered pair of groups over an INTEGER-quantized value column — the
    distribution-shift significance twin of ks_2samp_pairs.

    Rank arithmetic on distinct-value CELLS (the kruskal_wallis shape):
    pooled mid-ranks carried as 2*avg_rank (exact BIGINT), the rank sum
    S2₁ = Σ d1·r2 exact, U doubled to stay integral (U2 = S2₁ − n1(n1+1),
    mean 2U = 2·n1n2/2 = n1n2), and

        z = (U2 − n1·n2) / (2·sqrt(n1n2/12·((n+1) − Σ(t³−t)/(n(n−1)))))

    one closed form under the bit-exact sqrt. Returns
    (g1, g2, n1, n2, u2, z_u).
    """
    v = F.col(value_col).cast("long")
    cells = (
        df.groupBy(F.col(group_col).alias("g"), v.alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = cells.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    pairs = totals.select(
        F.col("g").alias("g1"), F.col("n").alias("n1")
    ).join(
        totals.select(F.col("g").alias("g2"), F.col("n").alias("n2")),
        F.col("g1") < F.col("g2"),
    )
    sided = pairs.join(
        cells, (cells["g"] == pairs["g1"]) | (cells["g"] == pairs["g2"])
    ).select(
        "g1",
        "g2",
        "n1",
        "n2",
        "v",
        F.when(F.col("g") == F.col("g1"), F.col("c"))
        .otherwise(F.lit(0))
        .alias("c1"),
        F.col("c").alias("ct"),
    )
    merged = sided.groupBy("g1", "g2", "n1", "n2", "v").agg(
        F.sum("c1").cast("long").alias("d1"),
        F.sum("ct").cast("long").alias("t"),
    )
    w = (
        Window.partitionBy("g1", "g2")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = merged.select(
        "g1",
        "g2",
        "n1",
        "n2",
        "d1",
        "t",
        (F.lit(2) * F.sum("t").over(w) - F.col("t") + F.lit(1))
        .cast("long")
        .alias("r2"),
    )
    g = ranked.groupBy("g1", "g2", "n1", "n2").agg(
        F.sum(F.col("d1") * F.col("r2")).cast("long").alias("s2_1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie3"),
    )
    n = (F.col("n1") + F.col("n2")).cast("long")
    u2 = (F.col("s2_1") - F.col("n1") * (F.col("n1") + F.lit(1))).cast("long")
    var = (F.col("n1") * F.col("n2")).cast("double") / F.lit(12.0) * (
        (n + F.lit(1)).cast("double")
        - F.col("tie3").cast("double") / (n * (n - F.lit(1))).cast("double")
    )
    z = (u2 - F.col("n1") * F.col("n2")).cast("double") / (
        F.lit(2.0) * F.sqrt(var)
    )
    return g.select("g1", "g2", "n1", "n2", u2.alias("u2"), z.alias("z_u"))


def bootstrap_weight(id_col: "F.Column", r_col: "F.Column") -> "F.Column":
    """The deterministic multiplier-bootstrap weight in {0, 1, 2} for
    (row id, replicate r): md5(id || ':' || r) first-8-hex mod 4 mapped
    0→0, 1→2, else→1 (mean 1). Single source for the batch gate and the
    streaming fold."""
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", id_col, r_col)), 1, 8), 16, 10
    ).cast("long")
    return (
        F.when(u % 4 == 0, F.lit(0))
        .when(u % 4 == 1, F.lit(2))
        .otherwise(F.lit(1))
        .cast("long")
    )


def bootstrap_ci_mean(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    b: int = 32,
) -> DataFrame:
    """Deterministic MULTIPLIER bootstrap CI for the per-key mean: replicate
    r draws integer weight w in {0, 1, 2} per row from md5(id || ':' || r)
    (P(0) = P(2) = 1/4, P(1) = 1/2 — mean 1, so each replicate is an
    unbiased resample), replicate mean = sum(w*x)/sum(w), and the interval
    is the POSITIONAL [1st, b-th] order statistic of the b replicate means
    (the ceil(0.025 b)/ceil(0.975 b) percentile ranks at b = 32).

    Exactness: weights are integers, both replicate-mean operands are exact
    BIGINT sums, so each mean is ONE division — bit-identical cross-engine —
    and min/max over bit-identical doubles is engine-independent (the
    events_theilsen positional-statistic argument).

    Scale shape: ONE scan exploded x b (row-local, no shuffle until the
    (keys, r) aggregate); per-key state is b pairs of longs. Output:
    (keys..., n, mean, ci_lo, ci_hi) with mean/bounds unquantized.
    """
    x = F.col(value_col).cast("long")
    rep = df.select(
        *key_cols,
        x.alias("__x"),
        F.col(id_col).cast("string").alias("__id"),
        F.explode(F.array(*[F.lit(r) for r in range(b)])).alias("__r"),
    )
    w = bootstrap_weight(F.col("__id"), F.col("__r"))
    cells = rep.groupBy(*key_cols, "__r").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum(w).cast("long").alias("__sw"),
        F.sum(w * F.col("__x")).cast("long").alias("__swx"),
    )
    return bootstrap_from_cells(cells, key_cols)


def bootstrap_from_cells(cells: DataFrame, key_cols: list[str]) -> DataFrame:
    """Fold the per-(keys, replicate) bootstrap cells
    (__n, __sx, __sw, __swx) into (keys..., n, mean, ci_lo, ci_hi).
    Factored out so the STREAMING gate (whose update-mode aggregation
    emits exactly these monotone cells) shares the closed form verbatim
    with the batch path — the hist_estimate single-sourcing convention."""
    m_b = F.col("__swx").cast("double") / F.col("__sw").cast("double")
    return cells.groupBy(*key_cols).agg(
        F.max("__n").cast("long").alias("n"),
        (
            F.max("__sx").cast("double") / F.max("__n").cast("double")
        ).alias("mean"),
        F.min(m_b).alias("ci_lo"),
        F.max(m_b).alias("ci_hi"),
    )


def cluster_perm_test(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    unit_col: str,
    b: int = 64,
) -> DataFrame:
    """Deterministic cluster-randomization (permutation) test of the
    difference in per-key means between the two arms unit % 2 == 0 / != 0:
    replicate r reassigns each UNIT (cluster) to an arm by
    md5(unit || ':' || r) parity, and the two-sided p-value is
    (1 + #{r : |diff_r| >= |diff_obs|}) / (b + 1).

    Exactness: per-arm sums/counts are exact BIGINTs; every diff is the
    SAME closed-form double expression (two divisions, one subtraction) in
    identical operand order on both engines, so the |diff_r| >= |diff_obs|
    comparisons are between bit-identical doubles.

    Scale shape: one per-(keys, unit) pre-aggregate collapses events to
    units BEFORE the b-way explode; the replicate frame is |units| x b tiny
    rows. Output: (keys..., n, obs_diff, n_ge, p_value) unquantized.
    """
    x = F.col(value_col).cast("long")
    # read twice (observed diff + the b-way replicate explode) — pin the
    # per-unit collapse so the raw-event scan runs once
    per_unit = df.groupBy(*key_cols, F.col(unit_col).alias("__u")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).cast("long").alias("__s"),
    ).localCheckpoint(eager=True)

    def _diff(arm):
        s1 = F.sum(F.when(arm, F.col("__s"))).cast("long")
        n1 = F.sum(F.when(arm, F.col("__n"))).cast("long")
        s0 = F.sum(F.when(~arm, F.col("__s"))).cast("long")
        n0 = F.sum(F.when(~arm, F.col("__n"))).cast("long")
        return (
            s1.cast("double") / n1.cast("double")
            - s0.cast("double") / n0.cast("double")
        )

    obs = per_unit.groupBy(*key_cols).agg(
        F.sum("__n").cast("long").alias("n"),
        _diff(F.col("__u") % 2 == 0).alias("obs_diff"),
    )
    rep = per_unit.select(
        *key_cols,
        "__u",
        "__n",
        "__s",
        F.explode(F.array(*[F.lit(r) for r in range(b)])).alias("__r"),
    )
    g = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("__u").cast("string"), F.col("__r")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    diffs = rep.groupBy(*key_cols, "__r").agg(_diff(g).alias("__diff"))
    j = diffs.join(obs, key_cols)
    agg = j.groupBy(*key_cols, "n", "obs_diff").agg(
        F.sum(
            F.when(F.abs(F.col("__diff")) >= F.abs(F.col("obs_diff")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_ge")
    )
    return agg.select(
        *key_cols,
        "n",
        "obs_diff",
        "n_ge",
        (
            (F.col("n_ge") + F.lit(1)).cast("double")
            / F.lit(float(b + 1))
        ).alias("p_value"),
    )


def logrank_test(
    df: DataFrame,
    key_cols: list[str],
    unit_col: str,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Two-arm log-rank test (Mantel-Haenszel) per key — the survival
    inference twin of the Nelson-Aalen gate; despite the name it needs NO
    logarithms. Arms: unit % 2. At each distinct event time t:

        O1_t = d1_t,  E1_t = d_t * n1_t / n_t,
        V_t = d_t * (n1_t/n_t) * (1 - n1_t/n_t) * (n_t - d_t)/(n_t - 1)

    with n*_t the at-risk counts (time >= t, censored rows count while at
    risk but never as deaths). All counts are exact BIGINTs; each E/V term
    is micro-quantized to BIGINT 1e-6 units BEFORE the cross-time sum (the
    events_anova convention — double sums are order-sensitive, BIGINT sums
    are not); Z = (O1 - E1)/sqrt(V) is one closed form on the drained
    micro-sums. Expects one row per unit: (keys..., unit, time, event 0/1).
    Output: (keys..., o1, e1, v, z) with e1/v in micro-units folded back.
    """
    arm1 = (F.col(unit_col) % 2 == 0).cast("long")
    # referenced three times (totals, deaths, exits) — pin the per-unit
    # frame or the upstream lineage re-runs per reference; it is |units|
    # rows, already collapsed (the minhash tagged-pin precedent)
    per = df.select(
        *key_cols,
        arm1.alias("__a1"),
        F.col(time_col).cast("long").alias("__t"),
        F.col(event_col).cast("long").alias("__e"),
    ).localCheckpoint(eager=True)
    tot = per.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__N"),
        F.sum("__a1").cast("long").alias("__N1"),
    )
    # deaths per distinct event time
    deaths = (
        per.where(F.col("__e") == 1)
        .groupBy(*key_cols, "__t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__d"),
            F.sum("__a1").cast("long").alias("__d1"),
        )
    )
    # exits (any unit leaving the risk set at t: death or censoring)
    exits = per.groupBy(*key_cols, "__t").agg(
        F.count(F.lit(1)).cast("long").alias("__x"),
        F.sum("__a1").cast("long").alias("__x1"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = exits.select(
        *key_cols,
        "__t",
        F.coalesce(F.sum("__x").over(w), F.lit(0)).cast("long").alias("__gone"),
        F.coalesce(F.sum("__x1").over(w), F.lit(0))
        .cast("long")
        .alias("__gone1"),
    )
    dr = deaths.join(risk, [*key_cols, "__t"])
    # empty key_cols = one global test: the totals join degenerates to a
    # broadcast cross join (DataFrame.join rejects an empty key list)
    j = (
        dr.join(tot, key_cols)
        if key_cols
        else dr.crossJoin(F.broadcast(tot))
    ).select(
        *key_cols,
        "__d",
        "__d1",
        (F.col("__N") - F.col("__gone")).alias("__n"),
        (F.col("__N1") - F.col("__gone1")).alias("__n1"),
    )
    nd = F.col("__n").cast("double")
    n1d = F.col("__n1").cast("double")
    dd = F.col("__d").cast("double")
    e_term = dd * n1d / nd
    v_term = (
        dd
        * (n1d / nd)
        * (F.lit(1.0) - n1d / nd)
        * (
            (nd - dd)
            / (nd - F.lit(1.0))
        )
    )
    micro = j.select(
        *key_cols,
        "__d1",
        F.floor(e_term * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("__e6"),
        F.when(F.col("__n") > 1,
               F.floor(v_term * F.lit(1000000.0) + F.lit(0.5)).cast("long"))
        .otherwise(F.lit(0))
        .alias("__v6"),
    )
    g = micro.groupBy(*key_cols).agg(
        F.sum("__d1").cast("long").alias("o1"),
        F.sum("__e6").cast("long").alias("__se6"),
        F.sum("__v6").cast("long").alias("__sv6"),
    )
    e1 = F.col("__se6").cast("double") / F.lit(1000000.0)
    v = F.col("__sv6").cast("double") / F.lit(1000000.0)
    z = (F.col("o1").cast("double") - e1) / F.sqrt(v)
    return g.select(*key_cols, "o1", e1.alias("e1"), v.alias("v"), z.alias("z"))


def mde_power(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Minimum detectable effect for a 50/50 two-arm test at alpha = 0.05
    (two-sided), power = 0.80: MDE = (1.96 + 0.84) * sqrt(2 * s^2 / (n/2)),
    with s^2 the Bessel variance from exact BIGINT moments. The z literals
    are plain decimal strings both engines parse to the identical double;
    the whole statistic is one fixed-order expression with two bit-exact
    sqrts. Output: (keys..., n, sd, mde) unquantized."""
    x = F.col(value_col).cast("long")
    g = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("__s"),
        F.sum(x * x).cast("long").alias("__p0"),
    )
    nd = F.col("n").cast("double")
    var = (F.col("n") * F.col("__p0") - F.col("__s") * F.col("__s")).cast(
        "double"
    ) / (nd * (nd - F.lit(1.0)))
    half = F.expr("n div 2").cast("double")
    mde = F.lit(2.8) * F.sqrt(F.lit(2.0) * var / half)
    return g.select(*key_cols, "n", F.sqrt(var).alias("sd"), mde.alias("mde"))


def stratified_ate(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    unit_col: str,
    stratum_col: str,
) -> DataFrame:
    """Post-stratification average-treatment-effect estimate per key:
    arms are unit % 2; within each stratum the arm-mean difference is the
    usual two-division closed form over exact BIGINT cells, and the ATE is
    the stratum-size-weighted average sum_s (n_s/n) * (m1_s - m0_s). Each
    stratum term is micro-quantized to BIGINT 1e-6 units BEFORE the
    cross-stratum sum (the events_anova convention). Strata missing an arm
    are dropped from numerator AND weight mass (complete-cell analysis).
    Output: (keys..., n_used, n_strata, ate) unquantized."""
    arm = (F.col(unit_col) % 2 == 0)
    x = F.col(value_col).cast("long")
    cells = df.groupBy(*key_cols, F.col(stratum_col).alias("__st")).agg(
        F.count(F.lit(1)).cast("long").alias("__ns"),
        F.sum(F.when(arm, x)).cast("long").alias("__s1"),
        F.sum(F.when(arm, 1).otherwise(0)).cast("long").alias("__n1"),
        F.sum(F.when(~arm, x)).cast("long").alias("__s0"),
        F.sum(F.when(~arm, 1).otherwise(0)).cast("long").alias("__n0"),
    ).where((F.col("__n1") > 0) & (F.col("__n0") > 0))
    diff = (
        F.col("__s1").cast("double") / F.col("__n1").cast("double")
        - F.col("__s0").cast("double") / F.col("__n0").cast("double")
    )
    micro = cells.select(
        *key_cols,
        "__ns",
        F.floor(
            F.col("__ns").cast("double") * diff * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__wd6"),
    )
    g = micro.groupBy(*key_cols).agg(
        F.sum("__ns").cast("long").alias("n_used"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("__wd6").cast("long").alias("__swd"),
    )
    return g.select(
        *key_cols,
        "n_used",
        "n_strata",
        (
            F.col("__swd").cast("double")
            / F.lit(1000000.0)
            / F.col("n_used").cast("double")
        ).alias("ate"),
    )


def tukey_fences(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Tukey box-plot fences per key — PURE INTEGER end to end: quartiles
    are positional order statistics at ranks (n+1)//4, (n+1)//2, 3(n+1)//4
    over the (value, id) total order, and the 1.5-IQR outlier tests are
    cross-multiplied (2x < 5*Q1 - 3*Q3 / 2x > 5*Q3 - 3*Q1), so no float
    exists anywhere in the operator.
    Output: (keys..., n, q1, q2, q3, n_out_lo, n_out_hi)."""
    w = Window.partitionBy(*key_cols).orderBy(value_col, id_col)
    x = F.col(value_col).cast("long")
    ranked = df.select(
        *key_cols,
        x.alias("__x"),
        F.row_number().over(w).cast("long").alias("__r"),
        F.count(F.lit(1))
        .over(Window.partitionBy(*key_cols))
        .cast("long")
        .alias("__n"),
    )
    qs = ranked.groupBy(*key_cols, "__n").agg(
        F.max(
            F.when(F.col("__r") == F.greatest(F.expr("(__n + 1) div 4"), F.lit(1)), F.col("__x"))
        )
        .cast("long")
        .alias("q1"),
        F.max(
            F.when(F.col("__r") == F.greatest(F.expr("(__n + 1) div 2"), F.lit(1)), F.col("__x"))
        )
        .cast("long")
        .alias("q2"),
        F.max(
            F.when(
                F.col("__r")
                == F.greatest(F.expr("(3 * (__n + 1)) div 4"), F.lit(1)),
                F.col("__x"),
            )
        )
        .cast("long")
        .alias("q3"),
    )
    j = df.select(*key_cols, x.alias("__x")).join(qs, key_cols)
    return j.groupBy(*key_cols, "__n", "q1", "q2", "q3").agg(
        F.sum(
            F.when(
                F.lit(2) * F.col("__x")
                < F.lit(5) * F.col("q1") - F.lit(3) * F.col("q3"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_out_lo"),
        F.sum(
            F.when(
                F.lit(2) * F.col("__x")
                > F.lit(5) * F.col("q3") - F.lit(3) * F.col("q1"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_out_hi"),
    ).select(
        *key_cols,
        F.col("__n").alias("n"),
        "q1",
        "q2",
        "q3",
        "n_out_lo",
        "n_out_hi",
    )


def energy_distance_pairs(
    series: DataFrame,
    key_col: str,
    x_col: str,
) -> DataFrame:
    """Szekely energy distance between every unordered key pair:

        E = 2*Axy/(n*m) - Axx/n^2 - Ayy/m^2

    with A** the FULL double sums of |value differences| — exact BIGINTs
    from per-pair cross joins, so E is one fixed-order three-term double
    expression. Intended for bounded per-key series (the daily
    aggregates): cross joins are span^2 per pair, never events^2.
    Output: (k1, k2, n, m, e_stat) unquantized."""
    v = series.select(
        F.col(key_col).alias("k"), F.col(x_col).cast("long").alias("x")
    ).localCheckpoint(eager=True)  # self + cross joins all read it
    a = v.select(F.col("k").alias("ka"), F.col("x").alias("xa"))
    b = v.select(F.col("k").alias("kb"), F.col("x").alias("xb"))
    within = (
        a.join(b, F.col("ka") == F.col("kb"))
        .groupBy(F.col("ka").alias("k"))
        .agg(
            F.sum(F.abs(F.col("xa") - F.col("xb"))).cast("long").alias("aw"),
            F.count(F.lit(1)).cast("long").alias("nn"),
        )
        .select("k", "aw", F.sqrt(F.col("nn").cast("double")).cast("long").alias("n"))
    )
    cross = (
        a.join(b, F.col("ka") < F.col("kb"))
        .groupBy(F.col("ka").alias("k1"), F.col("kb").alias("k2"))
        .agg(
            F.sum(F.abs(F.col("xa") - F.col("xb"))).cast("long").alias("axy")
        )
    )
    j = (
        cross.join(
            within.select(
                F.col("k").alias("k1"),
                F.col("aw").alias("axx"),
                F.col("n").alias("n"),
            ),
            "k1",
        )
        .join(
            within.select(
                F.col("k").alias("k2"),
                F.col("aw").alias("ayy"),
                F.col("n").alias("m"),
            ),
            "k2",
        )
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    e = (
        F.lit(2.0) * F.col("axy").cast("double") / (nd * md)
        - F.col("axx").cast("double") / (nd * nd)
        - F.col("ayy").cast("double") / (md * md)
    )
    return j.select("k1", "k2", "n", "m", e.alias("e_stat"))

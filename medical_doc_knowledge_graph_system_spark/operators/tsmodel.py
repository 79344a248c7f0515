"""Time-series MODEL estimation over per-key integer-quantized series —
Yule-Walker AR(2), Ljung-Box portmanteau, Lo-MacKinlay variance ratio,
Haar multiresolution energy, matrix profile (motif discovery), and the
isotonic (monotone) regression closed form.

Every estimator follows the repo's exact-parity discipline (CLAUDE.md
invariant-style): the series is integer-quantized once, all moments are
exact BIGINT aggregates (order-free, map-side combinable), and floats
appear only in ONE final closed-form expression per output column, in a
fixed operand order an ANSI-SQL oracle can reproduce bit-for-bit. sqrt is
allowed (IEEE-correctly-rounded on both engines), ln/exp never.

Scale shape: all estimators aggregate per-key series whose length is the
CALENDAR length (days), not the event count — the raw 10^12-event table
collapses to |keys| x span rows in the daily pre-aggregate before any of
this runs. Windows partition by key and are span-bounded; the matrix
profile / isotonic pair frames are O(span^2) / O(span^3) per key over
that already-tiny series, never over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def acov_scaled(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
    max_lag: int = 2,
) -> DataFrame:
    """Per-key n^2-scaled autocovariances C_0..C_max_lag as exact BIGINTs.

    C_k = n^2 * sum_{t=1..n-k} (x_t - m)(x_{t+k} - m)  with m = S/n, expanded
    so no division ever happens:

        C_k = n^2*P_k - n*S*(H_k + T_k) + (n-k)*S^2

    where P_k = sum x_t*x_{t+k}, H_k/T_k the head/tail partial sums over the
    lag-k pair set. Ratios of C_k are the ratios of the unscaled
    autocovariances (the n^2 factor cancels), so downstream closed forms
    (AR coefficients, Ljung-Box) stay float-parity-trivial.

    Expects an integral x (quantize to whole units first if n^2*P_k could
    exceed int64 in cents). Output: (keys..., n, c0..c{max_lag}).
    """
    w = Window.partitionBy(*key_cols).orderBy(pos_col)
    x = F.col(x_col).cast("long")
    lagged = series.select(
        *key_cols,
        x.alias("__x"),
        *[F.lag(x, k).over(w).alias(f"__x{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__p0"),
    ]
    for k in range(1, max_lag + 1):
        xk = F.col(f"__x{k}")
        aggs += [
            F.sum(F.col("__x") * xk).cast("long").alias(f"__p{k}"),
            F.sum(xk).cast("long").alias(f"__h{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("__x"))).cast("long").alias(f"__t{k}"),
        ]
    g = lagged.groupBy(*key_cols).agg(*aggs)
    n, s = F.col("n"), F.col("__s")
    cols = [
        *key_cols,
        "n",
        (n * n * F.col("__p0") - n * s * s).alias("c0"),
    ]
    for k in range(1, max_lag + 1):
        ck = (
            n * n * F.col(f"__p{k}")
            - n * s * (F.col(f"__h{k}") + F.col(f"__t{k}"))
            + (n - F.lit(k)) * s * s
        )
        cols.append(ck.alias(f"c{k}"))
    return g.select(*cols)


def yule_walker_ar2(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Per-key AR(2) fit by the Yule-Walker equations:

        phi1 = r1(1-r2)/(1-r1^2)    phi2 = (r2-r1^2)/(1-r1^2)

    computed on the scaled autocovariances (the shared n^2 factor cancels):
    phi1 = C1(C0-C2)/(C0^2-C1^2), phi2 = (C2*C0-C1^2)/(C0^2-C1^2). The C_k
    are exact BIGINTs; the products are formed in double (C^2 would overflow
    int64) in a fixed operand order, so the oracle's identical expression is
    bit-identical. Output: (keys..., n, r1, r2, phi1, phi2) unquantized —
    callers quantize.
    """
    g = acov_scaled(series, key_cols, pos_col, x_col, max_lag=2)
    c0 = F.col("c0").cast("double")
    c1 = F.col("c1").cast("double")
    c2 = F.col("c2").cast("double")
    den = c0 * c0 - c1 * c1
    return g.select(
        *key_cols,
        "n",
        (c1 / c0).alias("r1"),
        (c2 / c0).alias("r2"),
        (c1 * (c0 - c2) / den).alias("phi1"),
        ((c2 * c0 - c1 * c1) / den).alias("phi2"),
    )


def ljung_box(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
    max_lag: int = 3,
) -> DataFrame:
    """Per-key Ljung-Box portmanteau statistic Q = n(n+2) * sum_k r_k^2/(n-k)
    for k = 1..max_lag, r_k = C_k/C_0 (scaled autocovariance ratio). Each
    r_k is ONE division of exact BIGINTs (bit-identical across engines);
    the k terms are summed left-to-right in a FIXED order (a literal
    expression chain, never a float aggregate). Output: (keys..., n, q_lb)
    unquantized."""
    g = acov_scaled(series, key_cols, pos_col, x_col, max_lag=max_lag)
    nd = F.col("n").cast("double")
    c0 = F.col("c0").cast("double")
    acc = None
    for k in range(1, max_lag + 1):
        rk = F.col(f"c{k}").cast("double") / c0
        term = (rk * rk) / (nd - F.lit(float(k)))
        acc = term if acc is None else (acc + term)
    return g.select(*key_cols, "n", (nd * (nd + F.lit(2.0)) * acc).alias("q_lb"))


def variance_ratio(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
    q: int = 5,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio statistic with NON-overlapping q-period
    aggregates: VR = Var(y)/(q*Var(x)) where y_b = sum of each complete
    q-bucket of the series and both variances are Bessel sample variances.
    Cross-multiplied into two all-BIGINT polynomials so the statistic is
    ONE division:

        VR = ((nb*Pyy - Sy^2) * n*(n-1)) / (q*nb*(nb-1) * (n*P0 - S^2))

    Output: (keys..., n, nb, vr) unquantized. Expects whole-unit x (the
    bucket sums get squared)."""
    x = F.col(x_col).cast("long")
    base = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("s"),
        F.sum(x * x).cast("long").alias("p0"),
    )
    buck = (
        series.groupBy(
            *key_cols,
            F.expr(f"({pos_col} - 1) div {q}").alias("__b"),
        )
        .agg(
            F.sum(x).cast("long").alias("y"),
            F.count(F.lit(1)).alias("__bn"),
        )
        .where(F.col("__bn") == q)
    )
    bg = buck.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("pyy"),
    )
    j = base.join(bg, key_cols)
    num = (
        (F.col("nb") * F.col("pyy") - F.col("sy") * F.col("sy"))
        * F.col("n")
        * (F.col("n") - F.lit(1))
    )
    den = (
        F.lit(q)
        * F.col("nb")
        * (F.col("nb") - F.lit(1))
        * (F.col("n") * F.col("p0") - F.col("s") * F.col("s"))
    )
    return j.select(
        *key_cols,
        "n",
        "nb",
        (num.cast("double") / den.cast("double")).alias("vr"),
    )


def haar_energy(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
    levels: int = 4,
) -> DataFrame:
    """Haar wavelet detail energy per level over the first 2^levels points
    of each key's series — the multiresolution decomposition of variance
    (level 1 = fastest detail). PURE INTEGER: the level-k detail coefficient
    of block j is sum over the block of x * sign, sign = +1 on the block's
    first half and -1 on the second (bit k-1 of the 0-based position), so

        E_k = sum_j ( sum_{p0 >> k = j} x * (1 - 2*((p0 div 2^(k-1)) % 2)) )^2

    is two nested BIGINT aggregates — order-free, no floats anywhere.
    Output: (keys..., level, n_blocks, energy)."""
    leaves = 1 << levels
    base = series.where(F.col(pos_col) <= leaves).select(
        *key_cols,
        (F.col(pos_col) - 1).cast("long").alias("__p0"),
        F.col(x_col).cast("long").alias("__x"),
    )
    lv = base.select(
        *key_cols,
        "__p0",
        "__x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("level"),
                        F.lit(1 << (k - 1)).cast("long").alias("pw"),
                        F.lit(1 << k).cast("long").alias("bs"),
                    )
                    for k in range(1, levels + 1)
                ]
            )
        ).alias("__l"),
    ).select(
        *key_cols,
        F.col("__l.level").alias("level"),
        F.expr("__p0 div __l.bs").alias("__blk"),
        (
            F.col("__x")
            * (F.lit(1) - F.lit(2) * F.expr("(__p0 div __l.pw) % 2"))
        ).alias("__sx"),
    )
    d = lv.groupBy(*key_cols, "level", "__blk").agg(
        F.sum("__sx").cast("long").alias("__d")
    )
    return d.groupBy(*key_cols, "level").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("__d") * F.col("__d")).cast("long").alias("energy"),
    )


def matrix_profile(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
    m: int = 4,
) -> DataFrame:
    """Matrix profile (Yeh et al. 2016 semantics, un-normalized L2): for
    every length-m subsequence of each key's series, the squared distance
    to its nearest NON-TRIVIAL match (|i - j| >= m exclusion zone) and that
    match's start. d^2 is an exact BIGINT polynomial of the window cells;
    the nearest match is min(struct(d2, j)) — ties break to the smallest j
    deterministically. dist = sqrt(d2) is the only float (IEEE-exact).

    Scale shape: windows are pivoted out of ONE pos-explode (no window
    function), and the candidate join is per-key over the span-length
    window frame — O(span^2) per key on the daily series, never on events.
    Output: (keys..., i, nn, d2, dist)."""
    offs = series.select(
        *key_cols,
        F.col(x_col).cast("long").alias("__x"),
        F.explode(
            F.array(*[F.lit(t) for t in range(m)])
        ).alias("__t"),
        F.col(pos_col).cast("long").alias("__pos"),
    ).select(
        *key_cols,
        "__x",
        "__t",
        (F.col("__pos") - F.col("__t")).alias("i"),
    ).where(F.col("i") >= 1)
    win = (
        offs.groupBy(*key_cols, "i")
        .agg(
            *[
                F.sum(F.when(F.col("__t") == t, F.col("__x")))
                .cast("long")
                .alias(f"x{t}")
                for t in range(m)
            ],
            F.count(F.lit(1)).alias("__cnt"),
        )
        .where(F.col("__cnt") == m)
        .drop("__cnt")
        # referenced twice by the self-join below — pin or the whole
        # upstream lineage runs once per side (CLAUDE.md late-r2)
        .localCheckpoint(eager=True)
    )
    a = win.select(*key_cols, "i", *[F.col(f"x{t}").alias(f"a{t}") for t in range(m)])
    b = win.select(
        *key_cols,
        F.col("i").alias("j"),
        *[F.col(f"x{t}").alias(f"b{t}") for t in range(m)],
    )
    d2 = None
    for t in range(m):
        term = (F.col(f"a{t}") - F.col(f"b{t}")) * (F.col(f"a{t}") - F.col(f"b{t}"))
        d2 = term if d2 is None else (d2 + term)
    pairs = (
        a.join(b, key_cols)
        .where(F.abs(F.col("i") - F.col("j")) >= m)
        .select(*key_cols, "i", "j", d2.cast("long").alias("__d2"))
    )
    prof = pairs.groupBy(*key_cols, "i").agg(
        F.min(F.struct("__d2", "j")).alias("__nn")
    )
    return prof.select(
        *key_cols,
        "i",
        F.col("__nn.j").alias("nn"),
        F.col("__nn.__d2").alias("d2"),
        F.sqrt(F.col("__nn.__d2").cast("double")).alias("dist"),
    )


def isotonic_fit(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Isotonic (monotone non-decreasing) L2 regression per key via the
    minimax closed form of PAVA's solution:

        fit_i = max_{j <= i} min_{k >= i} mean(x[j..k])

    Interval means come from exact BIGINT prefix sums — each is ONE
    division, bit-identical across engines, so the min/max lattice over
    them is engine-independent. O(span^3) per key over the daily series
    (spans are calendar-bounded; at 10^12 events the series length is
    still the day count). Output: (keys..., pos, x, fit)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.col(x_col).cast("long")
    pre = series.select(
        *key_cols,
        F.col(pos_col).cast("long").alias("pos"),
        x.alias("__x"),
        F.sum(x).over(w).cast("long").alias("__cs"),
    ).localCheckpoint(eager=True)  # referenced three times (j, k, i legs)
    pj = pre.select(
        *key_cols,
        F.col("pos").alias("__j"),
        (F.col("__cs") - F.col("__x")).alias("__cs_jm1"),
    )
    pk = pre.select(
        *key_cols, F.col("pos").alias("__k"), F.col("__cs").alias("__cs_k")
    )
    jk = (
        pj.join(pk, key_cols)
        .where(F.col("__k") >= F.col("__j"))
        .select(
            *key_cols,
            "__j",
            "__k",
            (
                (F.col("__cs_k") - F.col("__cs_jm1")).cast("double")
                / (F.col("__k") - F.col("__j") + F.lit(1)).cast("double")
            ).alias("__avg"),
        )
    )
    pi = pre.select(*key_cols, F.col("pos").alias("__i"), F.col("__x").alias("x"))
    tri = pi.join(jk, key_cols).where(
        (F.col("__j") <= F.col("__i")) & (F.col("__k") >= F.col("__i"))
    )
    mink = tri.groupBy(*key_cols, "__i", "x", "__j").agg(
        F.min("__avg").alias("__mn")
    )
    fit = mink.groupBy(*key_cols, "__i", "x").agg(F.max("__mn").alias("fit"))
    return fit.select(*key_cols, F.col("__i").alias("pos"), "x", "fit")


def ses_dyadic(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Simple exponential smoothing with alpha = 1/2, computed EXACTLY:
    the recursion L_t = (x_t + L_{t-1})/2 unrolls to

        2^(n-1) * L_n = x_1 + sum_{t=2..n} x_t * 2^(t-2)

    — an order-free BIGINT weighted sum (dyadic weights are exact in
    binary), so the level needs no fold and no float recursion: ONE
    division at the end. Also reports the one-step-ahead error of the last
    observation vs L_{n-1} (the same sum truncated at n-1).

    Bounds: the top weight is 2^(n-2); keep series length under ~45 for
    cent-scale values (30-day calendars are fine). Output:
    (keys..., n, level, last_err) unquantized."""
    x = F.col(x_col).cast("long")
    p = F.col(pos_col).cast("long")
    n_over = Window.partitionBy(*key_cols)
    base = series.select(
        *key_cols,
        p.alias("__p"),
        x.alias("__x"),
        F.max(p).over(n_over).alias("__n"),
    )
    # the Python shiftleft API only takes a literal shift — go through SQL
    rows = base.select(
        *key_cols,
        "__p",
        "__x",
        "__n",
        (
            F.col("__x")
            * F.when(F.col("__p") == 1, F.lit(1).cast("long")).otherwise(
                F.expr(
                    "shiftleft(cast(1 as bigint), cast(__p - 2 as int))"
                )
            )
        ).alias("__wx"),
    )
    g = rows.groupBy(*key_cols, "__n").agg(
        F.sum("__wx").cast("long").alias("__num_n"),
        F.sum(F.when(F.col("__p") < F.col("__n"), F.col("__wx")))
        .cast("long")
        .alias("__num_nm1"),
        F.max(F.when(F.col("__p") == F.col("__n"), F.col("__x")))
        .cast("long")
        .alias("__xn"),
    )
    level = F.col("__num_n").cast("double") / F.expr(
        "shiftleft(cast(1 as bigint), cast(__n - 1 as int))"
    ).cast("double")
    prev = F.col("__num_nm1").cast("double") / F.expr(
        "shiftleft(cast(1 as bigint), cast(__n - 2 as int))"
    ).cast("double")
    return g.select(
        *key_cols,
        F.col("__n").alias("n"),
        level.alias("level"),
        (F.col("__xn").cast("double") - prev).alias("last_err"),
    )


def grubbs_stat(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Grubbs' outlier statistic G = max|x - mean| / s per key, with the
    position of the extreme point. The deviation max is the exact BIGINT
    max|n*x_t - S| (no mean division inside the max); G is one fixed-order
    double expression over (maxdev, n, nP0 - S^2) with the bit-exact sqrt.
    The arg position is the smallest pos attaining the max (deterministic).
    Output: (keys..., n, pos_at_max, g) unquantized."""
    x = F.col(x_col).cast("long")
    base = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("__s"),
        F.sum(x * x).cast("long").alias("__p0"),
    )
    j = series.join(base, key_cols).select(
        *key_cols,
        "n",
        "__s",
        "__p0",
        F.col(pos_col).cast("long").alias("__pos"),
        F.abs(F.col("n") * x - F.col("__s")).cast("long").alias("__dev"),
    )
    # argmax via the max-struct trick: largest dev first, then largest
    # -pos (= smallest pos) — one algebraic aggregate, fully deterministic
    g = j.groupBy(*key_cols, "n", "__s", "__p0").agg(
        F.max(
            F.struct(
                F.col("__dev").alias("d"), (-F.col("__pos")).alias("np")
            )
        ).alias("__mx")
    )
    nd = F.col("n").cast("double")
    vd = (F.col("n") * F.col("__p0") - F.col("__s") * F.col("__s")).cast(
        "double"
    )
    gstat = (F.col("__mx.d").cast("double") / nd) / F.sqrt(
        vd / (nd * (nd - F.lit(1.0)))
    )
    return g.select(
        *key_cols,
        "n",
        (-F.col("__mx.np")).cast("long").alias("pos_at_max"),
        gstat.alias("g"),
    )


def leadlag_corr(
    series: DataFrame,
    key_col: str,
    pos_col: str = "pos",
    x_col: str = "x",
    lags: tuple[int, ...] = (-1, 0, 1),
) -> DataFrame:
    """Lead-lag screening: Pearson correlation of every ordered key pair
    (k1 < k2) at each lag l — corr(x_{t}, y_{t+l}) over the positions where
    both series exist. The five Pearson moments are exact BIGINTs per
    (pair, lag); the correlation is one fixed-order double expression (two
    bit-exact sqrts). A positive peak at l = +1 means k1 LEADS k2.

    Scale shape: |keys|^2 x |lags| joined series — keys here are series
    identities (handfuls), never raw rows; each pair aggregates to 6 longs.
    Output: (k1, k2, lag, n, corr) unquantized."""
    a = series.select(
        F.col(key_col).alias("k1"),
        F.col(pos_col).cast("long").alias("__pa"),
        F.col(x_col).cast("long").alias("__xa"),
    )
    b = series.select(
        F.col(key_col).alias("k2"),
        F.col(pos_col).cast("long").alias("__pb"),
        F.col(x_col).cast("long").alias("__xb"),
    )
    lag_df = a.crossJoin(
        F.broadcast(
            a.sparkSession.createDataFrame(
                [(int(l),) for l in lags], "lag long"
            )
        )
    )
    m = lag_df.join(
        b,
        (F.col("__pb") == F.col("__pa") + F.col("lag"))
        & (F.col("k1") < F.col("k2")),
    )
    g = m.groupBy("k1", "k2", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__xa").cast("long").alias("__sx"),
        F.sum("__xb").cast("long").alias("__sy"),
        F.sum(F.col("__xa") * F.col("__xa")).cast("long").alias("__sxx"),
        F.sum(F.col("__xb") * F.col("__xb")).cast("long").alias("__syy"),
        F.sum(F.col("__xa") * F.col("__xb")).cast("long").alias("__sxy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("__sxy").cast("double") - F.col("__sx").cast(
        "double"
    ) * F.col("__sy").cast("double")
    vx = nd * F.col("__sxx").cast("double") - F.col("__sx").cast(
        "double"
    ) * F.col("__sx").cast("double")
    vy = nd * F.col("__syy").cast("double") - F.col("__sy").cast(
        "double"
    ) * F.col("__sy").cast("double")
    return g.select(
        "k1",
        "k2",
        "lag",
        "n",
        (cov / (F.sqrt(vx) * F.sqrt(vy))).alias("corr"),
    )


def best_stump(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Best single-split regression stump per key (the CART building
    block): over splits s, predict mean(x[1..s]) left / mean(x[s+1..n])
    right and pick the s minimizing total SSE. Each candidate's SSE is the
    fixed-order double

        (n_L*P0_L - S_L^2)/n_L + (n_R*P0_R - S_R^2)/n_R

    over exact BIGINT prefix moments (one window), so every candidate is
    bit-identical cross-engine and the argmin (min-struct, ties to the
    smallest s) is engine-independent.
    Output: (keys..., split_pos, sse, mean_l, mean_r) unquantized."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.col(x_col).cast("long")
    pre = series.select(
        *key_cols,
        F.col(pos_col).cast("long").alias("__s"),
        F.sum(x).over(w).cast("long").alias("__cs"),
        F.sum(x * x).over(w).cast("long").alias("__cp"),
        F.count(F.lit(1)).over(w).cast("long").alias("__cn"),
        F.sum(x).over(Window.partitionBy(*key_cols)).cast("long").alias("__ts"),
        F.sum(x * x)
        .over(Window.partitionBy(*key_cols))
        .cast("long")
        .alias("__tp"),
        F.count(F.lit(1))
        .over(Window.partitionBy(*key_cols))
        .cast("long")
        .alias("__tn"),
    ).where(F.col("__s") < F.col("__tn"))
    nl, sl, pl = F.col("__cn"), F.col("__cs"), F.col("__cp")
    nr = F.col("__tn") - nl
    sr = F.col("__ts") - sl
    pr = F.col("__tp") - pl
    sse = (nl * pl - sl * sl).cast("double") / nl.cast("double") + (
        nr * pr - sr * sr
    ).cast("double") / nr.cast("double")
    cand = pre.select(
        *key_cols,
        F.struct(
            sse.alias("sse"),
            F.col("__s").alias("s"),
            (sl.cast("double") / nl.cast("double")).alias("ml"),
            (sr.cast("double") / nr.cast("double")).alias("mr"),
        ).alias("__c"),
    )
    g = cand.groupBy(*key_cols).agg(F.min("__c").alias("__b"))
    return g.select(
        *key_cols,
        F.col("__b.s").alias("split_pos"),
        F.col("__b.sse").alias("sse"),
        F.col("__b.ml").alias("mean_l"),
        F.col("__b.mr").alias("mean_r"),
    )


def pettitt_test(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Pettitt rank-based change-point test per key — the nonparametric
    twin of the CUSUM gate: U_t = sum_{i<=t, j>t} sgn(x_j - x_i), the
    change point is argmax |U_t|, K = max|U_t|. PURE INTEGER via the
    telescoping identity U_t - U_{t-1} = sum_k sgn(x_k - x_t): one per-key
    cross join (span x span — the daily series, never events) for the
    per-position sign sums, one bounded cumulative window, one max-struct
    argmax (ties to the smallest position).
    Output: (keys..., n, cp_pos, k_stat)."""
    a = series.select(
        *key_cols,
        F.col(pos_col).cast("long").alias("__t"),
        F.col(x_col).cast("long").alias("__xt"),
    )
    b = series.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
        F.col(x_col).cast("long").alias("__xk"),
    )
    cond = None
    for k in key_cols:
        c = F.col(k) == F.col(f"__k_{k}")
        cond = c if cond is None else (cond & c)
    d = (
        a.join(b, cond)
        .groupBy(*key_cols, "__t")
        .agg(
            F.sum(F.signum((F.col("__xk") - F.col("__xt")).cast("double")))
            .cast("long")
            .alias("__d"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = d.select(
        *key_cols,
        "n",
        "__t",
        F.sum("__d").over(w).cast("long").alias("__u"),
    ).where(F.col("__t") < F.col("n"))
    g = walked.groupBy(*key_cols, "n").agg(
        F.max(
            F.struct(
                F.abs(F.col("__u")).alias("k"), (-F.col("__t")).alias("np")
            )
        ).alias("__mx")
    )
    return g.select(
        *key_cols,
        "n",
        (-F.col("__mx.np")).cast("long").alias("cp_pos"),
        F.col("__mx.k").cast("long").alias("k_stat"),
    )


def detrended_acf1(
    series: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
    x_col: str = "x",
) -> DataFrame:
    """Lag-1 autocorrelation of the OLS-DETRENDED series — the residual
    diagnostic (Durbin-Watson's question) run entirely in integers: the
    residual scaled by n*b_den,

        E_t = n*b_den*y_t - (Sy*b_den - b_num*Sx) - n*b_num*t

    is an exact BIGINT (b_num/b_den the cross-multiplied OLS slope), then
    uniformly SHIFTED POSITIVE and quantized by a truncating div (Spark
    `div` == DuckDB `//` only on non-negative operands — the shift is what
    makes the two engines agree), and r1 comes from the shared acov_scaled
    machinery on the quantized residual series. Output: (keys..., n, r1)
    unquantized."""
    x = F.col(x_col).cast("long")
    t = F.col(pos_col).cast("long")
    base = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(t).cast("long").alias("__sx"),
        F.sum(x).cast("long").alias("__sy"),
        F.sum(t * t).cast("long").alias("__sxx"),
        F.sum(t * x).cast("long").alias("__sxy"),
    )
    j = series.join(base, key_cols).select(
        *key_cols,
        t.alias("__t"),
        x.alias("__y"),
        (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).alias(
            "__bnum"
        ),
        (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).alias(
            "__bden"
        ),
        "__n",
        "__sx",
        "__sy",
    )
    e_raw = (
        F.col("__n") * F.col("__bden") * F.col("__y")
        - (
            F.col("__sy") * F.col("__bden")
            - F.col("__bnum") * F.col("__sx")
        )
        - F.col("__n") * F.col("__bnum") * F.col("__t")
    )
    quant = j.select(
        *key_cols,
        F.col("__t").alias("pos"),
        e_raw.alias("__e"),
    ).select(
        *key_cols,
        "pos",
        F.expr("((__e + 1000000000000) div 100000) - 10000000").alias("e"),
    )
    g = acov_scaled(quant, key_cols, "pos", "e", max_lag=1)
    return g.select(
        *key_cols,
        "n",
        (F.col("c1").cast("double") / F.col("c0").cast("double")).alias("r1"),
    )

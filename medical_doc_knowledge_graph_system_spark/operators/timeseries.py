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


def trend_ols(
    series: DataFrame,
    key_cols: list[str],
    x_col: str = "x",
    y_col: str = "y_c",
) -> DataFrame:
    """Per-key least-squares linear trend of an integer-quantized series:
    slope and intercept of y on x from FIVE exact BIGINT moments
    (n, Σx, Σx², Σy, Σxy) — one shuffle, map-side partials absorb the
    series, and the only floats are the two closed-form divisions at the
    very end (the assortativity pattern: exact integer moments keep float
    parity structural, because a single IEEE expression over identical
    BIGINT operands is bit-exact on any engine).

    Expects x (e.g. a day index) and y (e.g. metric quantized to cents)
    both integral. Output: (keys..., n, slope, intercept) with
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²-of-sum) and
    intercept = (Σy − slope·Σx) / n, both unrounded doubles.

    Scale shape: a plain groupBy — per-key state is 5 longs regardless of
    series length; no window, no sort, no Python.
    """
    g = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(x_col).cast("long")).cast("long").alias("sx"),
        F.sum(F.col(x_col).cast("long") * F.col(x_col).cast("long"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.col(y_col).cast("long")).cast("long").alias("sy"),
        F.sum(F.col(x_col).cast("long") * F.col(y_col).cast("long"))
        .cast("long")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return g.select(
        *key_cols, "n", slope.alias("slope"), intercept.alias("intercept")
    )


def mann_kendall_s(
    series: DataFrame,
    key_cols: list[str],
    x_col: str = "x",
    y_col: str = "y_c",
) -> DataFrame:
    """Per-key Mann-Kendall trend statistic S = Σ_{i<j} sign(y_j − y_i)
    over the series ordered by x — the NON-parametric twin of trend_ols:
    pure integer comparisons, so cross-engine parity is trivial (no
    float appears anywhere).

    Implemented as the literal pairwise self-join restricted to x1 < x2.
    Scale shape: the join is per-key and the per-key series here is
    CALENDAR-BOUNDED (daily points over a fixed window ⇒ n ≤ span days,
    pairs ≤ span²) — the quadratic blowup is capped by construction, not
    by data volume. For unbounded series use the O(n log n) inversion
    count instead; callers must pre-aggregate to a bounded grid first.
    Pin (localCheckpoint) the input if its lineage is expensive — both
    join branches re-run it otherwise.

    Output: (keys..., n_points, n_pairs, s_stat); s_stat > 0 ⇒ rising.
    """
    a = series.select(
        *key_cols,
        F.col(x_col).alias("__x1"),
        F.col(y_col).cast("long").alias("__y1"),
    )
    b = series.select(
        *key_cols,
        F.col(x_col).alias("__x2"),
        F.col(y_col).cast("long").alias("__y2"),
    )
    pairs = a.join(b, key_cols).where(F.col("__x1") < F.col("__x2"))
    counts = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    s = pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(F.col("__y2") > F.col("__y1"), 1)
            .when(F.col("__y2") < F.col("__y1"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat"),
    )
    return counts.join(s, key_cols, "left").select(
        *key_cols,
        "n_points",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("s_stat", F.lit(0)).cast("long").alias("s_stat"),
    )


def theil_sen(
    series: DataFrame,
    key_cols: list[str],
    x_col: str = "x",
    y_col: str = "y_c",
) -> DataFrame:
    """Per-key Theil–Sen estimator: the MEDIAN of all pairwise slopes
    (y_j − y_i)/(x_j − x_i), x_i < x_j — the robust (29%-breakdown)
    non-parametric twin of trend_ols, completing the trend triple
    (OLS / Mann-Kendall / Theil-Sen).

    Float parity is structural without quantization: each slope is ONE
    division of exact BIGINTs (bit-identical on any engine), sorting
    doubles is engine-independent, and the median is POSITIONAL — ranks
    ⌈m/2⌉ and ⌊m/2⌋+1 of the slope-sorted multiset, averaged. Rank ties
    among equal doubles are harmless (whichever row wins, the VALUE at a
    sorted position is well-defined), and the odd case degenerates to
    (a+a)/2 == a exactly in IEEE.

    Scale shape: the pairwise join is per-key and calendar-bounded
    (same contract as mann_kendall_s: daily grid ⇒ pairs ≤ span²); the
    median window sorts per-key pair frames, never the corpus. Output:
    (keys..., n_pairs, ts_slope) with ts_slope unrounded.
    """
    a = series.select(
        *key_cols,
        F.col(x_col).cast("long").alias("__x1"),
        F.col(y_col).cast("long").alias("__y1"),
    )
    b = series.select(
        *key_cols,
        F.col(x_col).cast("long").alias("__x2"),
        F.col(y_col).cast("long").alias("__y2"),
    )
    pairs = a.join(b, key_cols).where(F.col("__x1") < F.col("__x2"))
    sl = pairs.select(
        *key_cols,
        (
            (F.col("__y2") - F.col("__y1")).cast("double")
            / (F.col("__x2") - F.col("__x1")).cast("double")
        ).alias("__slope"),
    )
    w_rank = Window.partitionBy(*key_cols).orderBy("__slope")
    w_cnt = Window.partitionBy(*key_cols)
    r = sl.select(
        *key_cols,
        "__slope",
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_cnt).cast("long").alias("__m"),
    )
    lo = (F.col("__m") + F.lit(1)) / F.lit(2)
    hi = F.col("__m") / F.lit(2) + F.lit(1)
    mid = r.where(
        (F.col("__rn") == F.floor(lo)) | (F.col("__rn") == F.floor(hi))
    )
    return mid.groupBy(*key_cols).agg(
        F.max("__m").alias("n_pairs"),
        (F.sum("__slope") / F.count(F.lit(1)).cast("double")).alias(
            "ts_slope"
        ),
    )


def bollinger_bands(
    daily: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    value_col: str = "n",
    window: int = 7,
    k: float = 2.0,
) -> DataFrame:
    """Per-key Bollinger bands over an integer daily series: trailing
    ``window``-row moving average ± k·(Bessel sample stddev), the
    volatility envelope every metrics/anomaly dashboard draws.

    Float parity is structural: the frame holds ≤ ``window`` BIGINTs, so
    count / Σy / Σy² are exact integers (BIGINT sums are order-free);
    ma = Σy/n is ONE division, sd = sqrt((n·Σy² − (Σy)²)/(n·(n−1))) is
    ONE division under an IEEE-correctly-rounded sqrt (bit-exact on any
    engine, unlike ln/exp), and the bands are one fma-free add each.
    Rows with fewer than 2 frame observations (each key's first row) are
    dropped — the stddev is undefined there.

    Scale shape: one bounded per-key window (state = ``window`` rows),
    no global sort, no Python. Output: (keys..., day, value, n_obs, ma,
    sd, upper, lower) with the floats unrounded.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    y = F.col("__y")
    base = daily.select(
        *key_cols, day_col, F.col(value_col).cast("long").alias("__y")
    ).select(
        *key_cols,
        day_col,
        F.col("__y").alias(value_col),
        F.count(F.lit(1)).over(w).cast("long").alias("n_obs"),
        F.sum(y).over(w).cast("long").alias("__s"),
        F.sum(y * y).over(w).cast("long").alias("__ss"),
    )
    n_obs, s, ss = F.col("n_obs"), F.col("__s"), F.col("__ss")
    ma = s.cast("double") / n_obs.cast("double")
    sd = F.sqrt(
        (n_obs * ss - s * s).cast("double")
        / (n_obs * (n_obs - F.lit(1))).cast("double")
    )
    return base.where(n_obs >= 2).select(
        *key_cols,
        day_col,
        value_col,
        "n_obs",
        ma.alias("ma"),
        sd.alias("sd"),
        (ma + F.lit(float(k)) * sd).alias("upper"),
        (ma - F.lit(float(k)) * sd).alias("lower"),
    )


def autocorr_lag(
    series: DataFrame,
    key_cols: list[str],
    lag: int = 1,
    x_col: str = "x",
    y_col: str = "y_c",
) -> DataFrame:
    """Per-key lag-k autocorrelation of an integer series: Pearson r
    between (y_t, y_{t+lag}) over the pairs where BOTH grid points exist
    (gaps drop out of the equi-join naturally). Six exact BIGINT moments
    over the paired rows, then ONE closed-form double — sqrt is
    IEEE-correctly-rounded on both engines (bit-exact, unlike ln/exp),
    so the expression gives structural float parity.

    Overflow bound: m·Σy² must fit a signed 64-bit int — fine for counts
    and any series with |y| ≲ 3·10⁸ over ≤ 10³ points; quantize coarser
    (or pre-scale) beyond that.

    Pin the input if its lineage is expensive — both join branches read it.
    Output: (keys..., n_pairs, acf) with acf unrounded.
    """
    a = series.select(
        *key_cols,
        F.col(x_col).alias("__x"),
        F.col(y_col).cast("long").alias("__a"),
    )
    b = series.select(
        *key_cols,
        (F.col(x_col) - F.lit(int(lag))).alias("__x"),
        F.col(y_col).cast("long").alias("__b"),
    )
    pr = a.join(b, [*key_cols, "__x"])
    m = pr.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("__a").cast("long").alias("sa"),
        F.sum("__b").cast("long").alias("sb"),
        F.sum(F.col("__a") * F.col("__a")).cast("long").alias("saa"),
        F.sum(F.col("__b") * F.col("__b")).cast("long").alias("sbb"),
        F.sum(F.col("__a") * F.col("__b")).cast("long").alias("sab"),
    )
    num = (F.col("m") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = (F.col("m") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    db = (F.col("m") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return m.select(
        *key_cols,
        F.col("m").alias("n_pairs"),
        (num / (F.sqrt(da) * F.sqrt(db))).alias("acf"),
    )


def best_changepoint(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single best mean-shift changepoint per key series (the first step of
    binary segmentation / PELT): the split k that minimizes two-segment SSE,
    i.e. maximizes the explained gain

        gain(k) = S1²/k + (S-S1)²/(n-k) − S²/n

    over an INTEGER-quantized value column. Prefix sums S1 come from ONE
    cumulative window per key; every square stays exact BIGINT (cast to
    double only at the final three divisions, in identical operand order
    cross-engine); the gain is micro-quantized (×1000) to BIGINT and the
    argmax ranks (gain_q DESC, k ASC) so tie-breaks are exact. Output
    means are BIGINT floor divisions (`div` == DuckDB //) — no float
    output at all.

    Returns one row per key: (keys..., n, split_at = order value of the
    last point in segment 1, n_before, n_after, mean_before, mean_after,
    gain_milli).
    """
    wo = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy(*keys)
    v = F.col(value_col).cast("long")
    seq = df.select(
        *keys,
        F.col(order_col).alias("o"),
        F.row_number()
        .over(Window.partitionBy(*keys).orderBy(order_col))
        .cast("long")
        .alias("rn"),
        F.sum(v).over(wo).cast("long").alias("cum"),
        F.count(F.lit(1)).over(wk).cast("long").alias("n"),
        F.sum(v).over(wk).cast("long").alias("s"),
    )
    cand = seq.where(F.col("rn") < F.col("n"))
    a = (F.col("cum") * F.col("cum")).cast("double") / F.col("rn").cast(
        "double"
    ) + ((F.col("s") - F.col("cum")) * (F.col("s") - F.col("cum"))).cast(
        "double"
    ) / (F.col("n") - F.col("rn")).cast("double")
    base = (F.col("s") * F.col("s")).cast("double") / F.col("n").cast("double")
    scored = cand.select(
        *keys,
        "o",
        "rn",
        "cum",
        "n",
        "s",
        F.floor((a - base) * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("gain_milli"),
    )
    wr = Window.partitionBy(*keys).orderBy(
        F.desc("gain_milli"), F.asc("rn")
    )
    best = scored.withColumn("__rk", F.row_number().over(wr)).where(
        F.col("__rk") == 1
    )
    return best.select(
        *keys,
        "n",
        F.col("o").alias("split_at"),
        F.col("rn").alias("n_before"),
        (F.col("n") - F.col("rn")).cast("long").alias("n_after"),
        F.expr("cum div rn").alias("mean_before"),
        F.expr("(s - cum) div (n - rn)").alias("mean_after"),
        "gain_milli",
    )


def sax_symbolize(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """SAX symbolization (Lin et al. 2003) of a per-key INTEGER series:
    z-normalize against the key's own mean/Bessel-sd and bin into the
    4-symbol alphabet at the Gaussian quartile breakpoints ±0.6745 / 0 —
    the discretization step of classic time-series motif/anomaly mining.

    Parity: moments (n, Σy, Σy²) exact BIGINTs; z is one fixed-order
    closed form under the bit-exact sqrt; breakpoints are exact decimal
    literals; symbol choice is comparisons only. A zero-variance series
    (integer-exact guard on n·Σy²−(Σy)², never a float == 0) maps to all
    'b'. The word is assembled via array_sort(collect_list(struct)) —
    never a window sort.
    """
    wk = Window.partitionBy(*keys)
    v = F.col(value_col).cast("long")
    m = df.select(
        *keys,
        F.col(order_col).alias("o"),
        v.alias("y"),
        F.count(F.lit(1)).over(wk).cast("long").alias("cnt"),
        F.sum(v).over(wk).cast("long").alias("s"),
        F.sum(v * v).over(wk).cast("long").alias("ss"),
    )
    var_num = (F.col("cnt") * F.col("ss") - F.col("s") * F.col("s")).cast(
        "long"
    )
    mu = F.col("s").cast("double") / F.col("cnt").cast("double")
    sd = F.sqrt(
        var_num.cast("double")
        / (F.col("cnt") * (F.col("cnt") - F.lit(1))).cast("double")
    )
    z = (F.col("y").cast("double") - mu) / sd
    sym = F.when(var_num == 0, F.lit("b")).otherwise(
        F.when(z < F.lit(-0.6745), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(0.6745), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    marked = m.where(F.col("cnt") >= 2).select(*keys, "o", sym.alias("sym"))
    return marked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(o, sym))),"
            " s -> s.sym), '')"
        ).alias("sax"),
    )


def snaive_backtest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest: forecast(t) = value(t − season),
    scored by MAE over every point with an observed seasonal ancestor —
    the standard forecast-quality floor every real model must beat.
    Matches on the ORDER VALUE (t − season), not row offset, so calendar
    gaps don't misalign the season. Errors are exact BIGINTs; MAE is ONE
    division (floor-quantized to 4dp — engine round() differs at half
    boundaries)."""
    cur = df.select(
        *keys,
        F.col(order_col).alias("o"),
        F.col(value_col).cast("long").alias("y"),
    )
    past = df.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        (F.col(order_col) + F.lit(int(season))).alias("__o"),
        F.col(value_col).cast("long").alias("__yhat"),
    )
    cond = F.col("o") == F.col("__o")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__k_{k}"))
    j = cur.join(past, cond)
    g = j.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_backtest"),
        F.sum(F.abs(F.col("y") - F.col("__yhat"))).cast("long").alias(
            "total_abs_err"
        ),
    )
    mae = F.col("total_abs_err").cast("double") / F.col("n_backtest").cast(
        "double"
    )
    return g.select(
        *keys,
        "n_backtest",
        "total_abs_err",
        (F.floor(mae * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "mae"
        ),
    )


def seasonal_indices(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal indices (the classical-decomposition seasonal
    step): detrend by a CENTERED period-width moving average (edge rows
    without a full window are dropped), then average the detrended values
    per phase (order mod period).

    Parity: the trend is a frame-bounded average of `period` exact
    BIGINTs (order-free in a double — the ma7 precedent); the detrended
    residual subtracts identical doubles; each residual is micro-
    quantized (×1e6) to BIGINT BEFORE the per-phase mean (cross-row
    double sums are addition-order-sensitive); the mean is two fixed
    divisions, floor-quantized to 4dp on output.

    Scale: one window sort per key + one hash aggregate. Output:
    (keys..., phase, n_obs, seasonal).
    """
    half = int(period) // 2
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-half, half)
    )
    v = F.col(value_col).cast("long")
    m = df.select(
        *keys,
        F.col(order_col).alias("o"),
        v.alias("y"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_w"),
        F.sum(v).over(w).cast("long").alias("s_w"),
    ).where(F.col("n_w") == int(period))
    detr = F.col("y").cast("double") - F.col("s_w").cast("double") / F.lit(
        float(period)
    )
    cells = m.select(
        *keys,
        F.pmod(F.col("o"), F.lit(int(period))).cast("long").alias("phase"),
        F.floor(detr * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("dq"),
    )
    g = cells.groupBy(*keys, "phase").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("dq").cast("long").alias("sq"),
    )
    seasonal = (
        F.col("sq").cast("double")
        / F.col("n_obs").cast("double")
        / F.lit(1000000.0)
    )
    return g.select(
        *keys,
        "phase",
        "n_obs",
        (
            F.floor(seasonal * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)
        ).alias("seasonal"),
    )


#: repr() round-trips doubles exactly, so these literal strings parse to
#: the identical IEEE double on Spark AND DuckDB (the BENFORD_P convention)
#: — the trig table for the weekly-frequency periodogram. cos/sin
#: themselves are NOT correctly-rounded cross-engine; literals are.
import math as _math  # noqa: E402

P7_COS = {k: repr(_math.cos(2.0 * _math.pi * k / 7.0)) for k in range(7)}
P7_SIN = {k: repr(_math.sin(2.0 * _math.pi * k / 7.0)) for k in range(7)}


def periodogram_weekly(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single-frequency periodogram power at the weekly (period-7)
    frequency — the 'is there a day-of-week cycle' detector (the Goertzel
    shape: one pass, no FFT). a = Σ y·cos(2πd/7), b = Σ y·sin(2πd/7),
    P = (a² + b²)/n.

    Parity: the 7 cos/sin values are repr()-literal doubles (see P7_COS —
    transcendentals are not correctly rounded cross-engine, literals
    are); each product y·c is quantized to BIGINT micro-units BEFORE the
    cross-row sum; the power is one fixed-order closed form,
    floor-quantized to 4dp.
    """
    ph = F.pmod(F.col(order_col), F.lit(7)).cast("int")
    y = F.col(value_col).cast("long").cast("double")

    def _lit_case(table: dict[int, str]) -> F.Column:
        c = F.when(ph == 0, F.lit(float(table[0])))
        for k in range(1, 7):
            c = c.when(ph == k, F.lit(float(table[k])))
        return c.otherwise(F.lit(0.0))

    aq = F.floor(y * _lit_case(P7_COS) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    bq = F.floor(y * _lit_case(P7_SIN) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(aq).cast("long").alias("a_q"),
        F.sum(bq).cast("long").alias("b_q"),
    )
    a = F.col("a_q").cast("double") / F.lit(1000000.0)
    b = F.col("b_q").cast("double") / F.lit(1000000.0)
    p = (a * a + b * b) / F.col("n").cast("double")
    return g.select(
        *keys,
        "n",
        "a_q",
        "b_q",
        (F.floor(p * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "p7"
        ),
    )

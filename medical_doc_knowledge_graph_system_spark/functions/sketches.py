"""Deterministic mergeable sketches: KMV distinct-count and Count-Min
frequency estimation.

At 100 TB, exact per-key states (count-distinct sets, full frequency
tables) are the aggregations that stop fitting; sketches bound the state
at a fixed size per group and stay mergeable across partitions — the
sketch build here is a plain algebraic groupBy, so Spark's map-side
partial aggregation IS the sketch merge. Reference analogue: the global
count statistics around `app/services/graph_service.py` (get_statistics)
— the sketch path is what those counts become when the table stops
fitting a COUNT(DISTINCT).

Both sketches are built on md5 (CLAUDE.md invariant #3: the one hash
shared bit-exactly with the DuckDB oracles), so every estimate —
including the float division in the KMV estimator — is exactly
reproducible cross-engine: the only doubles are ONE closed-form
expression per output row over exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.skew import topk_per_group

# 48-bit hash space: wide enough that birthday collisions are negligible
# below ~2^24 distinct values per group, narrow enough that every
# (k-1) * 2^48 estimator numerator is an EXACT double (mantissa = k-1).
_HASH_HEX = 12
_HASH_SPACE = float(1 << (4 * _HASH_HEX))


def _h48(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, _HASH_HEX), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 32
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group (Bar-Yossef
    et al. 2002): keep the k smallest 48-bit hashes of the values; if the
    group has fewer than k distinct hashes the count is exact, else the
    k-th smallest hash h_k estimates the distinct count as
    (k-1) / (h_k / 2^48) — k-1 uniform points below h_k/2^48 of the unit
    interval.

    Returns (group_cols..., n_min, h_k, kmv_est): n_min = retained hash
    count (min(k, exact distinct)), h_k = largest retained hash, kmv_est
    = the estimate (exact below k). (k-1)*2^48 is an exact double for any
    practical k (trailing zero bits are free), so kmv_est is ONE
    closed-form division over BIGINTs — bit-reproducible cross-engine.

    Scale shape: one distinct on (group, hash) — map-side partials absorb
    per-group duplicate storms — then the hot-group-safe two-phase top-k
    (`topk_per_group`: a Zipf-headed group never funnels its full distinct
    set through one reducer's sort), then a k-row-per-group algebraic agg.
    State per group is k longs, the sketch property.
    """
    hashes = (
        df.select(*group_cols, _h48(F.col(value_col)).alias("__h"))
        .distinct()
    )
    top = topk_per_group(
        hashes, list(group_cols), [F.asc("__h")], k, rank_col="__r"
    )
    numer = float((k - 1) << (4 * _HASH_HEX))
    agg = top.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_min"),
        F.max("__h").alias("h_k"),
    )
    return agg.select(
        *group_cols,
        "n_min",
        "h_k",
        F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
        .otherwise(F.round(F.lit(numer) / F.col("h_k"), 4))
        .alias("kmv_est"),
    )


def kmv_set_ops(
    df: DataFrame, group_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """Theta-sketch set operations over per-group KMV sketches (Beyer et
    al. 2007, the KMV synopsis algebra behind DataSketches' theta
    sketch): for every unordered pair of groups estimate |A ∪ B|,
    Jaccard(A, B) and |A ∩ B| from the two k-minimum-value sketches
    alone — never touching the raw sets again. Reference analogue: the
    pairwise label-overlap statistics a graph_service-style stats
    endpoint would need across entity partitions once COUNT(DISTINCT)
    over the pair stops fitting.

    Estimator: U = the k smallest hashes of S_A ∪ S_B (the union sketch);
    θ = max(U); ρ = |{h ∈ U : h ∈ S_A ∧ h ∈ S_B}|. Then
    union_est = (k-1)·2⁴⁸/θ (exact |U| when |U| < k — both sketches are
    then exhaustive, so ρ and every estimate are exact too),
    jacc = ρ/|U|, inter_est = union_est · ρ / |U|.

    Float parity: the only doubles are the (k-1)·2⁴⁸ exact-double
    numerator divided/multiplied through BIGINTs in fixed left-to-right
    operand order — the events_kmv convention — so both engines see
    bit-identical results.

    Scale shape: the N-dependent work is exactly kmv_distinct's
    (distinct + hot-group-safe two-phase top-k); everything after runs on
    the G·k-row sketch table (pinned once — it feeds both sides of the
    pair expansion), and the pair algebra is O(G²·k) rows — independent
    of N, the sketch property. G is the group-domain size (event types,
    languages, labels): document counts never enter.

    Returns (type_a, type_b, n_u, h_u, rho, union_est, jacc, inter_est)
    for every pair with type_a < type_b.
    """
    hashes = df.select(
        F.col(group_col).cast("string").alias("g"),
        _h48(F.col(value_col)).alias("__h"),
    ).distinct()
    sk = topk_per_group(
        hashes, ["g"], [F.asc("__h")], k, rank_col="__r"
    ).select("g", "__h").localCheckpoint()

    gs = sk.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("type_a"))
        .join(gs.select(F.col("g").alias("type_b")))
        .where(F.col("type_a") < F.col("type_b"))
    )
    side_a = pairs.join(
        sk.withColumnRenamed("g", "type_a"), "type_a"
    ).select(
        "type_a", "type_b", "__h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    side_b = pairs.join(
        sk.withColumnRenamed("g", "type_b"), "type_b"
    ).select(
        "type_a", "type_b", "__h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    cand = (
        side_a.unionByName(side_b)
        .groupBy("type_a", "type_b", "__h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    u = topk_per_group(
        cand, ["type_a", "type_b"], [F.asc("__h")], k, rank_col="__r"
    )
    agg = u.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_u"),
        F.max("__h").alias("h_u"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("rho"),
    )
    numer = float((k - 1) << (4 * _HASH_HEX))
    union_raw = F.lit(numer) / F.col("h_u")
    return agg.select(
        "type_a", "type_b", "n_u", "h_u", "rho",
        F.when(F.col("n_u") < k, F.col("n_u").cast("double"))
        .otherwise(F.round(union_raw, 4))
        .alias("union_est"),
        F.round(F.col("rho") / F.col("n_u"), 4).alias("jacc"),
        F.when(F.col("n_u") < k, F.col("rho").cast("double"))
        .otherwise(F.round(union_raw * F.col("rho") / F.col("n_u"), 4))
        .alias("inter_est"),
    )


def hist_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bits: int = 12,
    qs: tuple[int, ...] = (50, 95),
) -> DataFrame:
    """Fixed-bucket histogram quantile sketch: bin values into 2^bits
    equal-width buckets over [lo, hi) (out-of-range clamps to the edge
    bins), estimate quantile q as the UPPER edge of the first bin whose
    cumulative count reaches ceil(q·n/100). Guarantees: the true quantile
    lies within the chosen bin, so the estimate overshoots by less than
    one bin width (hi-lo)/2^bits — the deterministic cousin of t-digest /
    KLL for when the value domain is known (metrics, scores, bounded
    gauges). Complements the exact `percentile` gate (`events_quantiles`),
    whose per-group state is ALL values: this sketch's state is <= 2^bits
    counters per group, merged by plain SUM — map-side partials ARE the
    merge, the property that keeps it one pass at 100 TB.

    Determinism/parity: binning is floor((v-lo)/(hi-lo)·2^bits) with both
    engines evaluating the identical operand order (pick power-of-two
    ranges and every op is exact); rank thresholds are pure BIGINT
    arithmetic ((q·n+99) div 100 — ceiling without floats); the only
    output doubles are the bin-edge closed forms.

    Returns (group_cols..., n, and per q: bin_pXX, est_pXX).
    """
    m = 1 << bits
    cells = df.groupBy(
        *group_cols, hist_bin(F.col(value_col), lo, hi, m).alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return hist_estimate(cells, group_cols, lo, hi, bits, qs)


def hist_bin(v, lo: float, hi: float, m: int) -> F.Column:
    """The histogram sketch's binning column — single-sourced so the batch
    groupBy and the streaming fold quantize identically (the operand
    shapes ARE the oracle parity)."""
    raw = F.floor((v - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * F.lit(m)).cast(
        "long"
    )
    return F.least(
        F.lit(m - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw)
    )


def hist_estimate(
    cells: DataFrame,
    group_cols: list[str],
    lo: float,
    hi: float,
    bits: int = 12,
    qs: tuple[int, ...] = (50, 95),
) -> DataFrame:
    """Quantile estimates from a (group_cols..., bin, c) cell frame — the
    single source of the estimate stage, shared by the batch sketch and
    the streaming fold's drain (cell merge is plain SUM/monotone MAX of
    counts, so a drained fold feeds the identical selection)."""
    m = 1 << bits
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = cells.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    aggs = [F.max("n").alias("n")]
    for qq in qs:
        thresh = F.expr(f"({qq} * n + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("cum") >= thresh, F.col("bin"))).alias(
                f"bin_p{qq}"
            )
        )
    out = cum.groupBy(*group_cols).agg(*aggs)
    edges = [
        (
            F.lit(lo)
            + (F.col(f"bin_p{qq}") + F.lit(1))
            * (F.lit(hi) - F.lit(lo))
            / F.lit(float(m))
        ).alias(f"est_p{qq}")
        for qq in qs
    ]
    return out.select(
        *group_cols, "n", *[F.col(f"bin_p{qq}") for qq in qs], *edges
    )


# HyperLogLog geometry: p=6 -> m=64 registers; md5 hex chars 1-2 pick the
# register, chars 3-17 (60 bits) feed the leading-zero rank, so max rank is
# 61. alpha_64 = 0.709, the standard bias constant for m=64.
_HLL_P = 6
_HLL_M = 1 << _HLL_P
# 2^-rank terms are quantized in 2^56 units: 2^(56-rank) is an EXACT BIGINT
# for rank <= 56 (ranks 57..61 floor to 0 — error < 64/2^56), and the worst
# case sum 64 * 2^56 = 2^62 still fits signed 64-bit.
_HLL_UNIT = 1 << 56


def _hll_reg_rank(col) -> tuple[F.Column, F.Column]:
    """(register, rank) columns from md5 — rank = leading-zero bits of the
    60-bit suffix + 1, computed on the HEX STRING (leading-'0' nibble run +
    a 4-way CASE on the first non-zero nibble) so Spark and DuckDB share
    every operation verbatim; no 64-bit shifts, no signedness traps."""
    h = F.md5(col.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % _HLL_M
    suffix = F.substring(h, 3, 15)
    stripped = F.regexp_replace(suffix, "^0+", "")
    z_nib = F.length(suffix) - F.length(stripped)
    nib = F.when(
        F.length(stripped) > 0,
        F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int"),
    ).otherwise(F.lit(0))
    extra = (
        F.when(nib >= 8, 0).when(nib >= 4, 1).when(nib >= 2, 2).when(nib >= 1, 3)
        .otherwise(F.lit(0))
    )
    return reg, (z_nib * 4 + extra + 1).cast("int")


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col
) -> DataFrame:
    """HyperLogLog distinct-count sketch per group (Flajolet et al. 2007):
    64 registers, each holding the max leading-zero rank of the md5 hashes
    routed to it; estimate = alpha * m^2 / sum(2^-M_j), with the standard
    linear-counting fallback m*ln(m/V) when the raw estimate is below 2.5m
    and V registers are still empty.

    Complements `kmv_distinct`: KMV keeps k hash VALUES (exact below k,
    state k longs); HLL keeps 64 six-bit ranks — the fixed ~48-byte state
    that merges with a plain MAX, which is why it is the industry default
    for streaming distinct counts. The register build here is an algebraic
    groupBy-max, so Spark's map-side partial aggregation IS the sketch
    merge.

    Float parity (CLAUDE.md invariant #3): every 2^-M_j term is the exact
    BIGINT 2^(56-M_j) (power-of-two doubles cast losslessly), the register
    sum is integer, and each output row's estimate is ONE closed-form
    double over exact BIGINTs — the branch condition (raw <= 2.5m) compares
    that same double, so both engines take identical branches.

    Returns (group_cols..., n_regs, zero_regs, denom_q, hll_est).
    """
    value = value_col if isinstance(value_col, F.Column) else F.col(value_col)
    reg, rank = _hll_reg_rank(value)
    regs = (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("m_j"))
    )
    q = F.when(
        F.col("m_j") <= 56,
        F.pow(F.lit(2.0), (F.lit(56) - F.col("m_j")).cast("double")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(q).cast("long").alias("sum_q"),
    )
    return hll_estimate(agg, group_cols)


def hll_estimate(agg: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimate selection from an (group_cols..., n_regs, sum_q) frame —
    the single source of the HLL estimate formula, shared by the batch
    sketch and the streaming fold's drain (never fork the closed form:
    its byte-identical operand shapes ARE the oracle parity)."""
    denom = (
        F.col("sum_q")
        + (F.lit(_HLL_M).cast("long") - F.col("n_regs")) * F.lit(_HLL_UNIT)
    ).cast("long")
    raw = F.lit(0.709) * F.lit(4096.0) * F.lit(float(_HLL_UNIT)) / F.col("denom_q")
    v = F.lit(_HLL_M).cast("long") - F.col("n_regs")
    return agg.select(
        *group_cols,
        "n_regs",
        v.alias("zero_regs"),
        denom.alias("denom_q"),
    ).select(
        *group_cols,
        "n_regs",
        "zero_regs",
        "denom_q",
        F.when(
            (F.col("zero_regs") > 0) & (raw <= F.lit(2.5 * _HLL_M)),
            F.round(F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zero_regs")), 4),
        )
        .otherwise(F.round(raw, 4))
        .alias("hll_est"),
    )


def hll_regs_to_moments(regs_col) -> tuple[F.Column, F.Column]:
    """(n_regs, sum_q) columns from a 64-long register ARRAY (the
    streaming fold's state shape) — the same integer-exact quantization
    the batch groupBy computes per register row."""
    present = F.filter(regs_col, lambda r: r > 0)
    n_regs = F.size(present).cast("long")
    sum_q = F.aggregate(
        present,
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.when(
            r <= 56,
            F.pow(F.lit(2.0), (F.lit(56) - r).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return n_regs, sum_q


def _cms_bucket(j_col, k_col, width: int) -> F.Column:
    """Row-j bucket of a key: md5-derived, shared verbatim by the batch
    build, the streaming fold and the DuckDB oracle (never fork)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(j_col.cast("string"), F.lit(":"), k_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """The Count-Min cell table (j, bucket, c): ONE algebraic groupBy over
    a depth-way explode — map-side combine collapses each partition to
    <= depth*width cells before the shuffle (the sketch-merge property);
    the result is depth*width rows TOTAL, independent of N."""
    rows = F.array([F.lit(j) for j in range(depth)])
    exploded = df.select(
        F.col(key_col).cast("string").alias("__k"), F.explode(rows).alias("j")
    ).select("j", _cms_bucket(F.col("j"), F.col("__k"), width).alias("bucket"))
    return exploded.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_probe(
    df: DataFrame,
    cells: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Probe every distinct key of `df` against a CMS cell table:
    (key, n_true, cms_est) with cms_est = MIN over the key's depth cells —
    the provable overestimate. n_true (the exact count) rides along as the
    accuracy gate."""
    rows = F.array([F.lit(j) for j in range(depth)])
    keys = df.groupBy(F.col(key_col).cast("string").alias(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    probes = keys.select(key_col, "n_true", F.explode(rows).alias("j")).select(
        key_col,
        "n_true",
        "j",
        _cms_bucket(F.col("j"), F.col(key_col), width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy(key_col, "n_true")
        .agg(F.min("c").alias("cms_est"))
    )


def cms_frequencies(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates:
    depth independent md5-derived hash rows of `width` buckets each; a
    key's estimate is the MIN over rows of its bucket's count — always an
    OVERESTIMATE (collisions only add), within eN/width with probability
    1 - exp(-depth) by the standard bound.

    Returns (key, n_true, cms_est) for every distinct key; n_true is the
    exact count so the gate verifies cms_est >= n_true row-for-row and the
    estimate error is measurable. Pure BIGINT arithmetic end to end —
    bit-exact cross-engine by construction. Same cells/probe semantics as
    cms_cells + cms_probe (the streaming fold still builds cells per event
    as a native update-mode aggregation).

    r6 (guide §2.3 'aggregate before you shuffle'): the bucket is a pure
    function of the KEY, so the exact per-key count is aggregated FIRST and
    the depth-way md5 explode runs over DISTINCT keys only — cells become
    sum(n_true) per bucket (identical totals), the hashed probe frame is
    pinned once and feeds both the cell build and the probe join, and the
    md5 count drops from 2 x depth x N_events to depth x N_keys.
    """
    rows = F.array([F.lit(j) for j in range(depth)])
    keys = df.groupBy(F.col(key_col).cast("string").alias(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    probes = (
        keys.select(key_col, "n_true", F.explode(rows).alias("j"))
        .select(
            key_col,
            "n_true",
            "j",
            _cms_bucket(F.col("j"), F.col(key_col), width).alias("bucket"),
        )
        .localCheckpoint()
    )
    cells = probes.groupBy("j", "bucket").agg(
        F.sum("n_true").cast("long").alias("c")
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy(key_col, "n_true")
        .agg(F.min("c").alias("cms_est"))
    )


def bloom_bits(grams: DataFrame, m: int = 1 << 18, k: int = 4) -> DataFrame:
    """Set-bit positions of a Bloom filter over `grams.gram` (Bloom 1970):
    k md5-derived positions per gram, distinct — at most m rows however
    large the input, the fixed-size-artifact property that lets a
    membership set over 10^5+ eval grams ship as a bounded broadcast
    instead of the gram strings themselves."""
    js = F.array([F.lit(j) for j in range(k)])
    return (
        grams.select(F.explode(js).alias("j"), "gram")
        .select(_bloom_bit(F.col("j"), F.col("gram"), m).alias("bit"))
        .distinct()
    )


def _bloom_bit(j_col, gram_col, m: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(j_col.cast("string"), F.lit(":"), gram_col)),
                1,
                _HASH_HEX,
            ),
            16,
            10,
        ).cast("long")
        % m
    )


def bloom_decontam(
    df: DataFrame,
    eval_grams: DataFrame,
    m: int = 1 << 18,
    k: int = 4,
    n: int = 4,
) -> DataFrame:
    """Bloom-filter decontamination probe: flag every training n-gram whose
    k filter positions are ALL set in the eval-suite Bloom filter — a
    superset of the exact `ngram_decontam_against` matches (no false
    negatives, deterministic md5-derived false positives at the standard
    (1 - e^(-kn/m))^k rate). The scale story vs the exact join: the
    broadcast side is the <= m-row bit set — fixed size no matter how the
    eval suite grows — and the training grams never leave their partitions
    except for the final per-doc count.

    Returns (doc_id, n_grams, n_flagged) for every doc with >= 1 gram:
    distinct-gram count and how many of them the filter flags. Pure
    integer arithmetic end to end.

    Scale shape: filter build is |eval| x k rows collapsed by distinct
    (map-side partials) to <= m; the probe explodes each distinct doc gram
    k ways, joins the broadcast bit set, and keeps grams with all k
    distinct j matched — collisions *within* one gram's probes are counted
    once (count DISTINCT j), so a double-mapped bit cannot fake a hit.
    """
    from .textfns import _ngrams_col, tokens_col

    bits = bloom_bits(eval_grams, m, k)
    js = F.array([F.lit(j) for j in range(k)])
    from ..operators.skew import ensure_parallelism

    grams = ensure_parallelism(df.select("doc_id", tokens_col().alias("__toks"))).select(
        "doc_id",
        F.explode(F.array_distinct(_ngrams_col(F.col("__toks"), n))).alias("gram"),
    ).localCheckpoint()
    probe = grams.select("doc_id", "gram", F.explode(js).alias("j")).select(
        "doc_id",
        "gram",
        "j",
        _bloom_bit(F.col("j"), F.col("gram"), m).alias("bit"),
    )
    flagged = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "gram")
        .agg(F.countDistinct("j").alias("__kj"))
        .where(F.col("__kj") == k)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_flagged"))
    )
    tot = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    return tot.join(flagged, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_flagged"), F.lit(0)).cast("long").alias("n_flagged"),
    )

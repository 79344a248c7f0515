"""Similarity search over an embedding column (array<float>).

  * brute-force cosine top-k — the exact baseline (reference E1/A10,
    app/rag/vector_rag.py:56-62 ChromaDB top-k replaced by a scored
    cross-join + TakeOrderedAndProject).
  * sign-block near-dup — LSH-style blocking on the sign pattern of the
    leading dimensions (deterministic, SQL-oracle-able), cosine verify on
    blocked pairs only: the scale path for all-pairs near-dup.
  * IVF — deterministic coarse quantizer (centroids = a fixed sample of the
    vectors), search restricted to the query's nearest cell: the scale path
    for top-k (cells ≈ sqrt(N) at 100 TB, each probe scans one cell).

All cosine math is explicit dot/(norm*norm) with round(4) so the DuckDB
oracle (list_dot_product) matches bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def topk_cosine(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """For each query vector, the k nearest vectors by cosine (excluding
    itself): (query_id, vec_id, score, rank). queries: (query_id, q_embedding).
    Broadcast the query side — it is always the small dimension."""
    from ..operators.skew import ensure_parallelism

    # r6 (guide §2.5/§4): spread the single-split scan; hoist both norms out
    # of the per-(query, vector) scoring (identical multiply order as
    # cosine_col => bit-identical rounded scores)
    q_n = queries.withColumn(
        "q_nrm", F.sqrt(_dot(F.col("q_embedding"), F.col("q_embedding")))
    )
    scored = (
        ensure_parallelism(embeddings)
        .withColumn("e_nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
        .join(F.broadcast(q_n))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    scored = scored.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("q_embedding"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("e_nrm")),
            4,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def auto_signblock_bits(n: int, target_bucket: int = 1024) -> int:
    """Blocking bits scaled to corpus size: 2^bits buckets sized so the
    expected bucket holds ~target_bucket vectors (bucket pair-join stays
    O(N * target_bucket), never O(N^2)). Clamped to [4, 24] — beyond 24 bits
    the key would consume more leading dimensions than a 64-d embedding can
    spare across 3 bands."""
    import math

    return max(4, min(24, math.ceil(math.log2(max(n, 1) / target_bucket + 1))))


def signblock_params(
    threshold: float, target_recall: float = 0.9, bits: int = 6, dims: int = 64
) -> tuple[int, int]:
    """(bits, n_bands) sized for >= target_recall on pairs at cosine >=
    threshold, under the hyperplane-LSH model: P(sign match on one dim) =
    1 - arccos(t)/pi; a band collides iff all `bits` dims match; bands read
    disjoint dim sets, so recall = 1 - (1 - p^bits)^n_bands. n_bands is
    capped at dims // bits (disjoint bands can't exceed the embedding dim)."""
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p_band = p**bits
    if p_band >= 1.0:
        return bits, 1
    n = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
    return bits, max(1, min(n, dims // bits))


def sign_block_key(emb_col, bits: int = 8, band: int = 0):
    """Blocking key from the sign pattern of `bits` dimensions; band b reads
    dims [b*bits+1 .. b*bits+bits], so distinct bands are disjoint dimension
    sets (independent hash families, the classic banded-LSH construction)."""
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(emb_col, band * bits + i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(bits)
        ],
    )


def neardup_pairs_signblock(
    embeddings: DataFrame, threshold: float = 0.95, bits: int = 8, n_bands: int = 1
) -> DataFrame:
    """Near-duplicate vector pairs: sign-pattern block, then exact cosine
    verify on within-block pairs only. (vec_a, vec_b, score).

    With n_bands > 1 each vector lands in one bucket per band (bands read
    disjoint leading dimensions); a pair is a candidate if it collides in ANY
    band — multi-band OR-amplification, so a near-dup pair differing in sign
    on one band's dims is still caught by the others (single-band misses it).
    Candidates are deduped across bands BEFORE the cosine verify so each pair
    is scored once."""
    # pin the (vec_id, blk) band keys: both halves of the bucket self-join
    # read them, and recomputing means re-scanning the embedding column and
    # re-deriving every sign bit per half. Narrow n_bands rows per vector.
    # The cosine-verify joins below deliberately re-scan the store instead:
    # materializing full vectors would cost more than the columnar re-read.
    bands = embeddings.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(str(b)), sign_block_key(F.col("embedding"), bits, band=b)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("blk"),
    ).localCheckpoint()
    l = bands.select(F.col("vec_id").alias("vec_a"), "blk")
    r = bands.select(F.col("vec_id").alias("vec_b"), "blk")
    cand = (
        l.join(r, "blk")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # r6 (guide §4): per-vector norms computed once on each verify side —
    # cosine_col evaluated three interpreted O(d) fold-dots per candidate
    # PAIR; with the hoist each pair pays one. Same float DAG (the same
    # sqrt results multiplied in the same order) => bit-identical scores.
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        nrm.alias("nrm_a"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        nrm.alias("nrm_b"),
    )
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                4,
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def ivf_centroids(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """The deterministic centroid table: embeddings of the n_cells smallest
    vec_ids (a fixed 'training sample'). Shared by ivf_assign and the query
    probe so the global top-N over the corpus is planned exactly once."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )


def ivf_centroids_kmeans(
    embeddings: DataFrame, n_cells: int = 16, seed: int = 42, max_iter: int = 20
) -> DataFrame:
    """TRAINED coarse quantizer (VERDICT r3 #2): seeded k-means|| with cosine
    distance over the corpus. Returns (cell, c_emb) in the same shape as
    ivf_centroids, so ivf_assign / topk_cosine_ivf take either.

    Why it exists: the fixed-sample quantizer (ivf_centroids) takes the
    n_cells SMALLEST vec_ids as centroids — deterministic and DuckDB-
    oracle-able, and fine when vec_ids are hash-ordered — but on a corpus
    whose row order correlates with content (a crawl ordered by domain or
    time), the leading rows are homogeneous: every centroid lands in one
    region and one cell absorbs most of the corpus, degenerating the probe
    toward a full scan. k-means|| allocates centroids by density (a hot
    cluster gets many cells), keeping cell sizes bounded; the fixed seed
    keeps it reproducible for a given input partitioning. Training cost is
    O(iter * N * n_cells) distributed — for 100 TB train on a sampled
    subset (.sample(fraction)) — and the centroid table collected here is
    n_cells * dim doubles, broadcast-sized by construction.

    Measured on a cluster-ordered synthetic corpus (scripts/ivf_ab.py,
    BENCH.md): sample quantizer skew (max cell / mean) ~8-30x with recall
    collapse; kmeans skew ~1-2x with recall@5 >= the hash-ordered baseline.
    NOT SQL-oracle-able (iterative training), so the driver-gate IVF queries
    keep the fixed-sample quantizer; this one is covered by pytest
    (determinism, assignment-compatibility) + the A/B script."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # cosine distance requires nonzero vectors
    X = embeddings.select(
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("n2"),
    ).where(F.col("n2") > 0).select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        distanceMeasure="cosine",
        initMode="k-means||",
    ).fit(X)
    cents = [
        (i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return embeddings.sparkSession.createDataFrame(
        cents, "cell int, c_emb array<double>"
    )


def ivf_assign(
    embeddings: DataFrame, n_cells: int = 16, cents: DataFrame | None = None
) -> DataFrame:
    """Deterministic IVF coarse quantizer: every vector is assigned to its
    max-cosine centroid. Returns (vec_id, embedding, cell)."""
    from ..operators.skew import ensure_parallelism

    if cents is None:
        cents = ivf_centroids(embeddings, n_cells)
    # r6 (guide §2.5/§4): vector norms hoisted out of the per-(vector, cell)
    # scoring — sqrt(dot(v,v)) once per row instead of once per centroid
    # probe, multiplied in the identical order as cosine_col so the rounded
    # score is bit-for-bit unchanged; the scan is spread first (embeddings
    # tables arrive as single-row-group parquet => 1 split).
    cents_n = cents.withColumn("c_nrm", F.sqrt(_dot(F.col("c_emb"), F.col("c_emb"))))
    scored = (
        ensure_parallelism(embeddings)
        .withColumn("e_nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
        .join(F.broadcast(cents_n))
        .select(
            "vec_id",
            "embedding",
            "cell",
            F.round(
                _dot(F.col("embedding"), F.col("c_emb"))
                / (F.col("e_nrm") * F.col("c_nrm")),
                6,
            ).alias("cs"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )


def auto_ivf_params(n: int) -> tuple[int, int]:
    """(n_cells, nprobe) scaled to corpus size: cells ≈ sqrt(N) keeps both
    the centroid broadcast and the per-cell scan at O(sqrt(N)); nprobe grows
    slowly (2 + log10) to hold recall as cell boundaries sharpen."""
    import math

    n_cells = max(4, 2 ** math.ceil(math.log2(max(math.isqrt(max(n, 1)), 2))))
    nprobe = min(n_cells, 2 + math.ceil(math.log10(max(n, 10))) // 2)
    return n_cells, nprobe


def topk_cosine_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 1,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k: probe the query's nprobe nearest cells. Approximate —
    recall vs topk_cosine is measured in bench.py (BENCH.md); at scale each
    probe touches nprobe/n_cells of the data. Use auto_ivf_params(N) to size
    n_cells ≈ sqrt(N) and nprobe for a large corpus. `cents` overrides the
    quantizer (pass ivf_centroids_kmeans(...) for the trained scale path)."""
    if cents is None:
        cents = ivf_centroids(embeddings, n_cells)
    # localCheckpoint: the centroid top-N over the corpus runs ONCE and both
    # the assignment and the query probe reuse the materialized result
    cents = cents.localCheckpoint()
    assigned = ivf_assign(embeddings, n_cells, cents=cents)
    qv = queries.select("query_id", "q_embedding")
    q_scored = qv.join(F.broadcast(cents)).select(
        "query_id",
        "q_embedding",
        F.col("cell").alias("q_cell"),
        F.round(cosine_col(F.col("q_embedding"), F.col("c_emb")), 6).alias("qcs"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qcs"), F.asc("q_cell"))
    probes = (
        q_scored.withColumn("qrn", F.row_number().over(wq))
        .where(F.col("qrn") <= nprobe)
        .select("query_id", "q_embedding", "q_cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), assigned.cell == probes.q_cell)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def semdedup(
    embeddings: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.85,
    cents: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embeddings with the IVF coarse quantizer, then compute
    pairwise cosine WITHIN each cell only and drop every vector that has an
    earlier (smaller vec_id) cell-mate at cosine >= threshold. Returns the
    DROP decisions (vec_id, dup_of, score) with dup_of the smallest
    qualifying earlier cell-mate (deterministic canonical) and score its
    cosine; keep-set = embeddings anti-join this.

    Scale shape: the quadratic stage is blocked per cell — never all-pairs.
    With cells ~ sqrt(N) (auto_ivf_params) and a TRAINED quantizer
    (ivf_centroids_kmeans) cell sizes stay near-uniform, so the within-cell
    self-join is the same bounded-bucket shape as the LSH dedup paths; the
    cell assignment itself is one broadcast join + one per-vector top-1
    window. This trades exactness at cell boundaries for never comparing
    across cells — the published SemDeDup design point.
    """
    # r6 OPTIMIZATION (guide §2.3/§2.4): (1) the assignment frame feeds both
    # self-join legs — pin it (Catalyst gives zero exchange reuse across
    # self-join branches, so unpinned it ran the scan + centroid join +
    # top-1 window twice); (2) hoist the per-vector norm sqrt(dot(v,v)) out
    # of the pair loop — cosine_col evaluates three O(d) dots per PAIR,
    # pre-computing each side's norm once per VECTOR leaves one dot per
    # pair with the identical float DAG (same sqrt results multiplied in
    # the same order => bit-identical scores); (3) the earliest-cell-mate
    # selection is min(struct(dup_of, score)) — an algebraic aggregate with
    # map-side partials — instead of a row_number window over every
    # qualifying pair.
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    a = ivf_assign(embeddings, n_cells, cents).withColumn("nrm", nrm).localCheckpoint()
    # the within-cell self-join has only n_cells distinct keys, which caps
    # reduce-side parallelism at n_cells tasks however many cores exist —
    # sub-block the right side deterministically (guide §2.5: salting; a
    # hash of vec_id, never rand()) and replicate the left over the blocks
    # so every pair is still generated exactly once
    blocks = 8
    lhs = a.select(
        "cell",
        F.col("vec_id").alias("dup_of"),
        F.col("embedding").alias("l_emb"),
        F.col("nrm").alias("l_nrm"),
    ).withColumn(
        "blk", F.explode(F.array(*[F.lit(i) for i in range(blocks)]))
    )
    rhs = a.withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(blocks)).cast("int")
    )
    pairs = (
        rhs.join(lhs, ["cell", "blk"])
        .where(F.col("dup_of") < F.col("vec_id"))
        .select(
            "vec_id",
            "dup_of",
            F.round(
                _dot(F.col("l_emb"), F.col("embedding"))
                / (F.col("l_nrm") * F.col("nrm")),
                4,
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
    return (
        pairs.groupBy("vec_id")
        .agg(F.min(F.struct("dup_of", "score")).alias("m"))
        .select("vec_id", F.col("m.dup_of").alias("dup_of"), F.col("m.score").alias("score"))
    )


def rerank_score_filter_cap(
    items: DataFrame,
    query_vec: DataFrame,
    threshold: float = 0.25,
    cap: int = 8,
    class_col: str = "label",
) -> DataFrame:
    """E3 rerank shape as a distributed DataFrame op (reference
    app/retrieval/context_builder.py:164-278: score each context element vs
    the query embedding, drop below threshold, sort desc, cap PER ELEMENT
    CLASS). items: (vec_id, embedding, <class_col>); query_vec: a 1-row
    (q_embedding) dim broadcast to every item. Returns
    (class, vec_id, score, rank) with rank <= cap inside each class."""
    scored = items.crossJoin(F.broadcast(query_vec)).select(
        F.col(class_col).alias("class"),
        "vec_id",
        F.round(cosine_col(F.col("q_embedding"), F.col("embedding")), 4).alias("score"),
    )
    w = Window.partitionBy("class").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.where(F.col("score") >= threshold)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cap)
        .select("class", "vec_id", "score", "rank")
    )


def kcenter_greedy(
    embeddings: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center selection (Gonzalez 1985) — the farthest-point
    coreset every diversity-aware data-pruning pipeline uses (Sener &
    Savarese 2018 core-set active learning): seed with the minimum id,
    then k−1 times pick the point FARTHEST from the selected set (max of
    min squared-L2, ties to the smaller id). The returned ``radius2``
    sequence is the classic 2-approximation coverage-radius certificate
    (non-increasing; radius2 of selection i bounds how far any point is
    from the first i−1 centers).

    Float parity is structural: d² = (v·v − 2·v·c) + c·c from three
    left-fold dot products in fixed operand order (identical on DuckDB
    via list_dot_product), `least` and comparisons only tighten — no
    accumulation across rows ever happens in floating point.

    Scale shape: k sequential rounds, each ONE TakeOrdered(1) argmax job
    plus one broadcast-single-row distance update; the min-distance
    frame is re-pinned every round so lineage stays flat. Exact over the
    full corpus — at 10^12 rows run it on a uniform pre-sample (the
    standard coreset-of-a-sample construction); k is user-bounded.

    Output: (sel_rank, id, radius2) — k rows, radius2 = 0.0 for the seed.
    """
    v = F.col(vec_col)
    e = embeddings.select(
        F.col(id_col).alias("__id"), v.alias("__v")
    ).localCheckpoint(eager=True)

    def d2(a, b):
        return (
            _dot(a, a) - F.lit(2.0) * _dot(a, b) + _dot(b, b)
        )

    seed = e.orderBy("__id").limit(1)
    picks = [seed.select("__id", "__v", F.lit(0.0).alias("__d2"))]
    mind = (
        e.crossJoin(
            F.broadcast(
                seed.select(
                    F.col("__v").alias("__cv"),
                )
            )
        )
        .select("__id", "__v", d2(F.col("__v"), F.col("__cv")).alias("__d2"))
        .localCheckpoint(eager=True)
    )
    for _ in range(1, int(k)):
        nxt = (
            mind.orderBy(F.desc("__d2"), F.asc("__id"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picks.append(nxt)
        mind = (
            mind.crossJoin(
                F.broadcast(nxt.select(F.col("__v").alias("__cv")))
            )
            .select(
                "__id",
                "__v",
                F.least(
                    F.col("__d2"), d2(F.col("__v"), F.col("__cv"))
                ).alias("__d2"),
            )
            .localCheckpoint(eager=True)
        )
    out = picks[0].select(
        F.lit(1).alias("sel_rank"), F.col("__id").alias(id_col), "__d2"
    )
    for i, p in enumerate(picks[1:], start=2):
        out = out.union(
            p.select(
                F.lit(i).alias("sel_rank"), F.col("__id").alias(id_col), "__d2"
            )
        )
    return out.select("sel_rank", id_col, F.col("__d2").alias("radius2"))


def kmeans_lloyd_quantized(
    embeddings: DataFrame,
    k: int = 4,
    rounds: int = 2,
    scale_bits: int = 20,
) -> DataFrame:
    """Fixed-round Lloyd k-means over INTEGER-QUANTIZED embeddings — the
    oracle-able clustering operator (the trained `ivf_centroids_kmeans`
    quantizer is the float production path; this one trades its k-means||
    init for bit-exact cross-engine parity, the events_hll convention
    applied to clustering).

    Parity by construction: every coordinate is floor(x · 2^scale_bits) +
    2^scale_bits — a power-of-two scaling of a double is EXACT, so the
    floor is exact, and the +offset keeps the domain non-negative so
    BIGINT `div` (truncation) == floor division in both engines. From
    there everything is integer: squared-L2 assignment distances (exact
    BIGINT sums, deterministic (dist, cid) tie-break), centroid updates
    as per-dimension BIGINT sum `div` count, and the final inertia an
    exact BIGINT sum. No float ever enters an aggregate or a comparison.

    Scale shape (the MLlib distributed-Lloyd plan): the quantized corpus
    is pinned once; per round the k-row centroid table BROADCASTS into
    the assignment (N·k narrow rows, algebraic min-struct — map-side
    combine absorbs any cluster skew) and the update is a posexplode
    groupBy (cid, dim) that collapses to k·dim cells map-side; the only
    driver-sized object is the k×dim centroid table. rounds is fixed
    (count-free loop, lineage flattened per round).

    Returns one row per surviving cluster: (cid, n_members, inertia,
    rep) with rep = min member vec_id.
    """
    s = 1 << scale_bits
    q = embeddings.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x * F.lit(float(s))).cast("long") + F.lit(s)
        ).alias("qe"),
    ).localCheckpoint()

    def _dist_to(cents: DataFrame) -> DataFrame:
        return q.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "cid",
            F.aggregate(
                F.zip_with("qe", "ce", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dist"),
        )

    def _assign(cents: DataFrame) -> DataFrame:
        return (
            _dist_to(cents)
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist"))
        )

    cents = q.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("ce")
    )
    for _ in range(rounds):
        asg = _assign(cents).join(q, "vec_id")
        dims = (
            asg.select("cid", F.posexplode("qe").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s_"), F.count(F.lit(1)).cast("long").alias("n_"))
            .select("cid", "pos", F.expr("s_ div n_").alias("cv"))
        )
        cents = (
            dims.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("a"))
            .select("cid", F.transform("a", lambda st: st["cv"]).alias("ce"))
            .localCheckpoint()
        )
    return (
        _assign(cents)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("dist").cast("long").alias("inertia"),
            F.min("vec_id").alias("rep"),
        )
    )


def pq_codebook(
    embeddings: DataFrame, m: int = 4, n_cents: int = 16, dims: int = 64
) -> DataFrame:
    """Product-quantization codebook (Jégou et al. 2011, TPAMI): the
    embedding space is split into ``m`` contiguous subspaces of
    ``dims // m`` dimensions; each subspace gets ``n_cents`` centroids.

    Quantizer choice mirrors ``ivf_centroids`` (reference
    ``app/rag/embeddings.py`` has no trained index either): a fixed
    deterministic sample — the ``n_cents`` lowest vec_ids — supplies the
    centroids, which keeps the whole construction oracle-able in SQL.
    Swap in ``ivf_centroids_kmeans`` per subspace for a trained codebook
    at deployment; the assignment/ADC plumbing below is identical.

    Returns (cell, sub, c_sub) — m * n_cents rows, always broadcastable.
    """
    sd = dims // m
    cents = embeddings.where(F.col("vec_id") < n_cents)
    return cents.select(
        F.col("vec_id").alias("cell"),
        F.posexplode(
            F.array(*[F.slice("embedding", j * sd + 1, sd) for j in range(m)])
        ).alias("sub", "c_sub"),
    )


def pq_codebook_kmeans(
    embeddings: DataFrame,
    m: int = 4,
    n_cents: int = 16,
    dims: int = 64,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """TRAINED PQ codebook: one seeded Euclidean k-means per subspace over
    the subvector projections (the Jégou et al. construction proper),
    same (cell, sub, c_sub) shape as pq_codebook so pq_encode / topk_pq
    take either.

    Why it exists: the fixed-sample codebook quantizes every subspace
    with the SAME n_cents leading rows — oracle-able (the gate keeps it,
    the ivf_centroids precedent) but untrained, so codes waste centroids
    on whatever the leading rows happen to cover. Training per subspace
    allocates centroids by that subspace's own density; measured recall
    uplift is in BENCH.md (scripts/pq_ab.py). m sequential fits of an
    N x (dims/m) problem; at 100 TB train each on .sample(fraction) —
    codebook size is m * n_cents * dims/m doubles either way, always
    broadcast-sized. NOT SQL-oracle-able (iterative), so it is covered
    by pytest + the A/B script, not a driver gate."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sd = dims // m
    spark = embeddings.sparkSession
    rows = []
    for j in range(m):
        X = embeddings.select(
            array_to_vector(
                F.slice("embedding", j * sd + 1, sd).cast("array<double>")
            ).alias("features")
        )
        model = KMeans(
            k=n_cents, seed=seed + j, maxIter=max_iter, initMode="k-means||"
        ).fit(X)
        rows += [
            (i, j, [float(v) for v in c])
            for i, c in enumerate(model.clusterCenters())
        ]
    return spark.createDataFrame(rows, "cell int, sub int, c_sub array<double>")


def pq_encode(
    embeddings: DataFrame, codebook: DataFrame, m: int = 4, dims: int = 64
) -> DataFrame:
    """Encode every vector as m subspace codes: (vec_id, sub, cell).

    The code = the L2-NEAREST centroid of the subvector (the PQ paper's
    quantizer: it bounds the ADC error |q·v - q·c| <= |q||v - c|, which
    an argmax-dot assignment does not). dist² is the closed form
    v·v - 2 v·c + c·c from three left-fold dots in fixed operand order —
    bit-exact cross-engine; ties break to the lowest cell id. One
    broadcast join of the m*k-row codebook onto the exploded subvectors,
    one window per (vec_id, sub) over k rows — never a global sort.

    Scale shape: the output is the COMPRESSED index — m small ints per
    vector (m bytes at k<=256) instead of dims floats, an O(dims/m * 8/1)
    = 128x storage cut at the gate's 64-dim/4-sub layout. At 100 TB the
    codes table is what sits in memory; raw vectors are only read at
    encode time (one scan) and never at query time.
    """
    sd = dims // m
    # r6 (guide §4): hoist the two self-dots out of the per-(vector,
    # centroid) scoring — v·v once per subvector (not once per centroid
    # probe) and c·c once per codebook row before the broadcast; the
    # combined expression keeps the identical operand order
    # (vv − 2·(v·c) + cc), so d2 is bit-for-bit unchanged.
    from ..operators.skew import ensure_parallelism

    vs = ensure_parallelism(embeddings.select("vec_id", "embedding")).select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("embedding", j * sd + 1, sd) for j in range(m)])
        ).alias("sub", "v_sub"),
    ).withColumn("__vv", _dot(F.col("v_sub"), F.col("v_sub")))
    cb_n = codebook.withColumn("__cc", _dot(F.col("c_sub"), F.col("c_sub")))
    dist2 = (
        F.col("__vv")
        - F.lit(2.0) * _dot(F.col("v_sub"), F.col("c_sub"))
        + F.col("__cc")
    )
    scored = vs.join(F.broadcast(cb_n), "sub").select(
        "vec_id", "sub", "cell", dist2.alias("d2")
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("d2"), F.asc("cell")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "sub", "cell")
    )


def topk_pq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_cents: int = 16,
    dims: int = 64,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, build the
    m×n_cents lookup table of query-subvector·centroid dots ONCE, then
    score every candidate as the sum of its m table entries — queries
    never touch a raw candidate vector. The per-query LUT (m*k rows per
    query) broadcasts onto the codes table; the scan side is the
    compressed index only.

    Float parity: each LUT entry is one left-fold dot product (bit-exact
    cross-engine); the per-candidate score sums the m entries in FIXED
    subspace order (conditional-max pivot, then d0+d1+...+d_{m-1}) —
    never a float groupBy-sum, whose addition order is plan-dependent.

    Returns (query_id, vec_id, score, rank) with score rounded to 4dp,
    rank <= k under the deterministic (score desc, vec_id asc) order.
    """
    # pin the m*n_cents-row codebook: the encode pass and the query LUT
    # both read it (unpinned, Catalyst re-derives it per branch — one
    # extra corpus scan; the late-r2 shared-intermediate rule)
    if codebook is None:
        codebook = pq_codebook(embeddings, m=m, n_cents=n_cents, dims=dims)
    cb = codebook.localCheckpoint()
    codes = pq_encode(embeddings, cb, m=m, dims=dims)
    sd = dims // m
    qs = queries.select(
        "query_id",
        F.posexplode(
            F.array(*[F.slice("q_embedding", j * sd + 1, sd) for j in range(m)])
        ).alias("sub", "q_sub"),
    )
    lut = qs.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "cell", _dot("q_sub", "c_sub").alias("qd")
    )
    parts = codes.join(F.broadcast(lut), ["sub", "cell"])
    pivots = [
        F.max(F.when(F.col("sub") == j, F.col("qd"))).alias(f"d{j}")
        for j in range(m)
    ]
    adc = parts.groupBy("query_id", "vec_id").agg(*pivots)
    score = F.col("d0")
    for j in range(1, m):
        score = score + F.col(f"d{j}")
    scored = adc.where(F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", F.round(score, 4).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def topk_mips(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Maximum-inner-product top-k per query — the retrieval scoring used
    when vectors are NOT length-normalized (recommendation / learned
    sparse retrieval), distinct from topk_cosine. Returns
    (query_id, vec_id, dot_q, rank).

    The ranking happens on the ×1e9-quantized BIGINT dot (vec_id
    tiebreak), so top-k selection is engine-exact; the dot itself is the
    fixed-order left-fold (bit-identical to DuckDB list_dot_product).

    Scale note: exact MIPS is one broadcast + scan. The ANN path uses the
    Bachrach 2014 reduction — augment x with sqrt(M² − |x|²) so every
    row has norm M, making MIPS order == cosine order — and then any
    cosine LSH (neardup_pairs_signblock) buckets it; for exact top-k the
    augmentation is a constant rescale, so we rank the raw dot directly.
    """
    scored = embeddings.join(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    dq = F.floor(
        _dot(F.col("q_embedding"), F.col("embedding")) * F.lit(1000000000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = scored.select("query_id", "vec_id", dq.alias("dot_q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            (F.col("dot_q") / F.lit(1000000000.0)).alias("dot"),
            "rank",
        )
    )


def label_centroid_cosines(
    embeddings: DataFrame, label_col: str = "label", q: float = 10000.0
) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids — the
    embedding-drift / cluster-separation screen (two labels whose
    centroids collapse toward cosine 1 are not separable).

    Mean-of-many-doubles is addition-order-sensitive, so the centroid is
    computed in INTEGER space: each coordinate is quantized to BIGINT
    (floor(v*q + 0.5)) at the row level, per-(label, dim) sums are exact
    BIGINT hash aggregates off a posexplode (the columnar trick — never a
    driver collect), and the pairwise cosine is ONE closed form over the
    exact integer dot/norm moments (products cast to double before the
    cross-dim sum would be wrong — they stay BIGINT; size q so
    n_rows·(q·|v|)² per dim fits int64).

    Returns (l1, l2, n1, n2, cos_c) for every unordered label pair.
    """
    cells = (
        embeddings.select(
            F.col(label_col).alias("l"),
            F.posexplode("embedding").alias("dim", "v"),
        )
        .groupBy("l", "dim")
        .agg(
            F.sum(F.floor(F.col("v") * F.lit(float(q)) + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("s")
        )
        .localCheckpoint(eager=True)
    )
    counts = (
        embeddings.groupBy(F.col(label_col).alias("l"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = cells.select(F.col("l").alias("l1"), "dim", F.col("s").alias("s1"))
    b = cells.select(F.col("l").alias("l2"), F.col("dim").alias("dim2"), F.col("s").alias("s2"))
    pr = a.join(b, (F.col("dim") == F.col("dim2")) & (F.col("l1") < F.col("l2")))
    mom = pr.groupBy("l1", "l2").agg(
        F.sum(F.col("s1") * F.col("s2")).cast("long").alias("sxy"),
        F.sum(F.col("s1") * F.col("s1")).cast("long").alias("sxx"),
        F.sum(F.col("s2") * F.col("s2")).cast("long").alias("syy"),
    )
    n1 = counts.select(F.col("l").alias("l1"), F.col("n").alias("n1"))
    n2 = counts.select(F.col("l").alias("l2"), F.col("n").alias("n2"))
    out = mom.join(F.broadcast(n1), "l1").join(F.broadcast(n2), "l2")
    # centroid scale factors 1/n cancel in the cosine, so the integer
    # SUM moments give the centroid cosine directly
    cos = F.col("sxy").cast("double") / (
        F.sqrt(F.col("sxx").cast("double")) * F.sqrt(F.col("syy").cast("double"))
    )
    return out.select("l1", "l2", "n1", "n2", cos.alias("cos_c"))


def knn_loo_accuracy(
    embeddings: DataFrame,
    label_col: str = "label",
    k: int = 5,
    sample_mod: int = 17,
) -> DataFrame:
    """Leave-one-out k-NN classification accuracy per label — the
    label-agreement probe of embedding quality (an embedding whose
    neighbors don't share labels won't drive semantic dedup either).
    Queries are the deterministic vec_id % sample_mod == 0 sample (the
    kg_closeness sampling convention: exact on the sample, SF-scaling);
    each query's k nearest OTHER vectors vote, majority with
    (count DESC, label ASC) tiebreak.

    Ranking happens on the ×1e9-quantized BIGINT cosine (vec_id
    tiebreak) so neighbor selection is engine-exact; accuracy is ONE
    floor-quantized division.
    """
    qs = embeddings.where(
        F.col("vec_id") % F.lit(int(sample_mod)) == 0
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col(label_col).alias("true_label"),
    )
    scored = embeddings.join(F.broadcast(qs)).where(
        F.col("vec_id") != F.col("query_id")
    )
    sq = F.floor(
        cosine_col(F.col("q_embedding"), F.col("embedding"))
        * F.lit(1000000000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = scored.select(
        "query_id", "true_label", F.col(label_col).alias("nbr_label"),
        "vec_id", sq.alias("score_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("vec_id")
    )
    nbrs = scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= int(k)
    )
    votes = nbrs.groupBy("query_id", "true_label", "nbr_label").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("c"), F.asc("nbr_label")
    )
    pred = votes.withColumn("vr", F.row_number().over(wv)).where(
        F.col("vr") == 1
    )
    g = pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(
            F.when(F.col("nbr_label") == F.col("true_label"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )
    acc = F.col("n_correct").cast("double") / F.col("n_queries").cast("double")
    return g.select(
        "label",
        "n_queries",
        "n_correct",
        (F.floor(acc * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "acc"
        ),
    )


def sign_words(emb_col, dims: int = 64):
    """(w1, w2): the embedding's 64-bit sign mask as two 32-bit words, each
    built by a left-to-right fold acc*2 + (dim >= 0) — pure integers (two
    words so no fold ever touches the BIGINT sign bit). The >= 0 convention
    matches neardup_pairs_signblock's hyperplane-LSH keys."""
    half = dims // 2

    def _word(sl):
        bits = F.transform(
            sl, lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        )
        return F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
        )

    return (
        _word(F.slice(emb_col, 1, half)),
        _word(F.slice(emb_col, half + 1, half)),
    )


def hamming_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Binary (sign-quantized) top-k retrieval: encode every vector as its
    64-bit hyperplane sign mask, rank candidates per query by Hamming
    distance bit_count(xor) — the 1-bit-per-dimension compression tier
    below sim_sq8 (8 bit/dim) and sim_pq (codebooks). Distances are small
    integers, so ranking needs no float convention at all; ties break on
    vec_id.

    Scale shape: the mask is 2 longs/vector (a 64x reduction of the scan
    payload); the query side broadcasts; at corpus scale the same masks
    feed the sign-block LSH (neardup) so encode once, serve both.
    Output: (query_id, vec_id, hamming, rank)."""
    w1, w2 = sign_words(F.col("embedding"))
    enc = embeddings.select(
        "vec_id", w1.alias("w1"), w2.alias("w2")
    )
    qw1, qw2 = sign_words(F.col("q_embedding"))
    qenc = queries.select(
        "query_id", qw1.alias("qw1"), qw2.alias("qw2")
    )
    scored = enc.join(F.broadcast(qenc)).where(
        F.col("vec_id") != F.col("query_id")
    )
    ham = (
        F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
        + F.bit_count(F.col("w2").bitwiseXOR(F.col("qw2")))
    ).cast("long")
    scored = scored.select("query_id", "vec_id", ham.alias("hamming"))
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "hamming", F.col("rank").cast("int").alias("rank"))
    )

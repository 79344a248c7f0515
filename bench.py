"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Measures (at $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1, on
local[$SPARK_GRAFT_CPUS]):
  * end-to-end KG pipeline (chunk -> extract -> resolve -> materialize) on
    the deterministic synthetic pages table sized for the sf (BASELINE.json
    metric: triples/sec end-to-end) -> extra keys triples_per_sec,
    docs_per_sec
  * headline queries() entries on the driver testdata.

SPARK_GRAFT_SCALING=1 additionally runs the pipeline at local[8] and
local[32] on the same input and reports scaling efficiency
(= (t8/t32)/4, north_rule target >= 0.8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medical_doc_knowledge_graph_system_spark.datagen import write_pages_parquet
from medical_doc_knowledge_graph_system_spark.pipeline import run_pipeline
from medical_doc_knowledge_graph_system_spark.session import get_spark

HEADLINE = [
    "kg_mentions",
    "kg_remap_salted",
    "kg_name_map",
    "kg_components",
    "kg_components_star",
    "kg_pagerank",
    "kg_pagerank_weighted",
    "kg_linkpred",
    "kg_negatives",
    "kg_triangles",
    "kg_butterflies",
    "kg_rel_cardinality",
    "kg_ktruss",
    "kg_sssp",
    "kg_kcore",
    "kg_hits",
    "kg_lpa",
    "kg_triples",
    "kg_cooccur_topk",
    "kg_khop2",
    "kg_chunks",
    "text_quality",
    "text_langid",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster",
    "dedup_containment",
    "dedup_prefix_filter",
    "curate_docs",
    "docs_profile",
    "sample_tokens",
    "sample_pack",
    "sample_stratified",
    "sample_split",
    "text_bpe_tokens",
    "text_rolling_hash",
    "url_canonical",
    "text_repetition",
    "text_pii_scrub",
    "dedup_substring",
    "dedup_editdist",
    "text_chunk_dedup",
    "text_bpe_merges",
    "decontam_ngram",
    "sim_topk",
    "sim_kmeans",
    "sim_neardup",
    "sim_neardup_bands",
    "sim_ivf_topk",
    "sim_ivf_probe2",
    "sim_semdedup",
    "rerank_class_cap",
    "mm_features",
    "mm_frame_sample",
    "mm_resize",
    "kg_shortest_path",
    "kg_paths",
    "kg_reasoning_paths",
    "kg_khop_rel",
    "decontam_suite",
    "events_hourly",
    "events_sessions",
    "events_asof",
    "events_latest",
    "events_ecdf",
    "events_attrib_pandas",
    "events_gapfill",
    "events_funnel",
    "events_pivot",
    "events_range_join",
    "events_retention",
    "events_cube",
    "events_session_native",
    "text_ngram_topk",
    "text_inverted_index",
    "text_tfidf_topk",
    "text_bm25_topk",
    "text_vocab_growth",
    "sample_temperature",
    "docs_global_rank",
    "kg_degree_hist",
    "kg_closeness",
    "kg_assortativity",
    "tpch_pricing",
    "tpch_rollup",
    "tpch_local_supplier",
    "tpch_top_customers",
    "tpch_ship_priority",
    "docs_setops",
    # late-r5 additions: whole-graph analytics, LM corpus statistics,
    # data-selection weights, deterministic sketches (streaming gates are
    # deliberately excluded — their wall is temp-dir staging, not the op)
    "kg_harmonic",
    "kg_betweenness",
    "kg_mis",
    "kg_modularity",
    "kg_walks",
    "kg_ppr",
    "text_doc_surprisal",
    "text_ppl_buckets",
    "text_zipf",
    "text_entropy",
    "text_flesch",
    "text_gopher_rules",
    "text_bigram_lm",
    "sample_dsir",
    "sample_weighted",
    "events_kmv",
    "events_kmv_ops",
    "events_cms",
    "events_hll",
    "events_hist",
    "events_ohlc",
    "events_ab_welch",
    "events_wilson",
    "events_cusum",
    "events_chisq",
    "events_assoc_rules",
    "text_winnowing",
    "tpch_order_priority",
    "tpch_promo",
    "tpch_complex_pred",
    "tpch_cust_dist",
    "tpch_small_qty",
    "tpch_big_orders",
    "tpch_nation_volume",
    "tpch_idle_customers",
    "tpch_top_supplier",
    "sim_sq8",
    "events_rfm",
    "text_rrf_fusion",
    "events_survival",
    "sample_neyman",
    "events_gini",
    "kg_mention_contexts",
    "sim_sq8_rerank",
    "decontam_bloom",
    "events_cohort_ltv",
    "events_top_paths",
    "tpch_forecast_revenue",
    "tpch_market_share",
    "sim_pq",
    "events_funnel_windowed",
    "source_crawl",
    "events_trend_ols",
    "events_mann_kendall",
    "docs_skyline",
    "tpch_waiting_suppliers",
    "tpch_shipmode",
    "tpch_supplier_cnt",
    "tpch_important_parts",
    "tpch_profit",
    "tpch_min_cost_supp",
    "tpch_part_promotion",
    "events_autocorr",
    "docs_checks",
    "events_simpson",
    "events_bollinger",
    "events_benford",
    "text_kn_bigram",
    "docs_zorder",
    "events_theilsen",
    "sim_kcenter",
    "kg_coloring",
    "events_anova",
    "sample_systematic",
    "events_markov2",
    "text_colloc_chi2",
    "text_rake",
    # fifteenth-session ops (stream gates excluded: their wall is staging)
    "events_ks",
    "events_kendall",
    "events_spearman",
    "events_kruskal",
    "events_trimmed",
    "events_mad",
    "events_runs",
    "events_groupsets",
    "events_changepoint",
    "events_phi",
    "events_rank_fns",
    "events_snaive",
    "events_sax",
    "events_intervals",
    "events_peaks",
    "events_realized_var",
    "text_ari",
    "text_textrank",
    "text_lexical",
    "text_keyness",
    "kg_reciprocity",
    "kg_scc",
    "kg_influence",
    "kg_cliques4",
    "sim_mips",
    "sim_centroids",
    "events_did",
    "events_cuped",
    "events_ar2",
    "events_ljungbox",
    "events_vratio",
    "events_haar",
    "events_matrix_profile",
    "events_isotonic",
    "events_bootstrap_ci",
    "events_permtest",
    "text_yule_k",
    "text_msttr",
    "dedup_lcs_run",
    "dedup_cdc",
    "events_ses",
    "events_grubbs",
    "events_leadlag",
    "events_range_frame",
    "events_kanon",
    "sim_hamming",
    "events_logrank",
    "events_stump",
    "events_power",
    "events_lateral",
    "dedup_simhash_pairs",
    "dedup_pr_eval",
    "events_pettitt",
    "text_burrows",
    "events_strat_ate",
    "events_fences",
    "events_energy_dist",
    "sim_ndcg_eval",
    "kg_richclub",
    "events_detrended_acf",
    "sample_coverage",
    "events_winsor",
    "mm_dedup",
    "events_chapman",
    "text_ngram_coverage",
    "events_mcnemar",
    "events_cochran_q",
    "text_hapax",
]

PAGES_FOR_SF = {"0.001": 200, "0.01": 2000, "0.1": 20000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else "0.1"


def _pages_path(sf: str) -> str:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache, exist_ok=True)
    n = PAGES_FOR_SF.get(sf, 20000)
    p = os.path.join(cache, f"pages_sf{sf}_{n}.parquet")
    if not os.path.exists(p):
        write_pages_parquet(p, n)
    return p


def run_kg_pipeline(cores: int, pages_path: str, tag: str, shuffle_partitions: int | None = None) -> dict:
    # scaling runs pin shuffle partitions (sized to data, like a real
    # cluster) so only executor parallelism varies between N and 4N
    spark = get_spark(app_name=f"bench_{tag}", cores=cores, shuffle_partitions=shuffle_partitions)
    wh_root = f"/tmp/mdkgs_bench_wh_{tag}"
    shutil.rmtree(wh_root, ignore_errors=True)
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()
    t0 = time.time()
    stats = run_pipeline(spark, pages, wh_root)
    wall = time.time() - t0
    spark.stop()
    return {
        "wall_sec": round(wall, 2),
        "n_pages": n_pages,
        "triples": stats["triples"],
        "triples_per_sec": round(stats["triples"] / wall, 1),
        "docs_per_sec": round(n_pages / wall, 1),
    }


def measure_ann_recall(spark, sf_dir: str) -> dict:
    """Recall of the approximate similarity paths vs their exact baselines
    (VERDICT r1 #5: the approximations must publish a measured recall, like
    the reference publishes retrieval quality, README.md:57-61).

      * IVF top-k recall@5 over 50 query vectors, at the driver-query params
        (16 cells / nprobe 2) and at auto_ivf_params(N).
      * sign-block near-dup recall on PLANTED twins: this corpus's max
        natural pairwise cosine is 0.60, so near-dup ground truth is planted
        deterministically (200 perturbed copies at cos ~ 0.97) and recall is
        measured at the design threshold 0.9 with (bits, n_bands) from
        signblock_params — the operating regime of hyperplane LSH. (The
        threshold-0.25 driver queries are blocking-semantics correctness
        checks, not a recall claim: no sign-LSH family can block cos 0.25.)
    """
    from pyspark.sql import functions as F

    from medical_doc_knowledge_graph_system_spark.functions.simsearch import (
        auto_ivf_params,
        neardup_pairs_signblock,
        signblock_params,
        topk_cosine,
        topk_cosine_ivf,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    n = emb.count()
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {(r.query_id, r.vec_id) for r in topk_cosine(emb, q, k=5).collect()}
    out: dict = {"n_vectors": n}
    auto_cells, auto_probe = auto_ivf_params(n)
    for tag, (cells, nprobe) in {
        "ivf_16c_2p": (16, 2),
        f"ivf_auto_{auto_cells}c_{auto_probe}p": (auto_cells, auto_probe),
    }.items():
        got = {
            (r.query_id, r.vec_id)
            for r in topk_cosine_ivf(emb, q, k=5, n_cells=cells, nprobe=nprobe).collect()
        }
        out[f"recall_at5_{tag}"] = round(len(got & exact) / len(exact), 4)

    import numpy as np

    thresh = 0.9
    n_plant = 200
    twin_off = 1_000_000
    base = {
        r.vec_id: np.array(r.embedding)
        for r in emb.where(F.col("vec_id") < n_plant).collect()
    }
    rng = np.random.default_rng(0)
    twins, truth = [], set()
    for vid in sorted(base):
        v = base[vid] / np.linalg.norm(base[vid])
        t = v + 0.25 * rng.standard_normal(v.shape) / np.sqrt(v.shape[0])
        cos = float(v @ t / np.linalg.norm(t))
        if cos >= thresh:
            truth.add((vid, vid + twin_off))
        twins.append((vid + twin_off, [float(x) for x in t]))
    planted = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(twins, "vec_id long, embedding array<double>")
    )
    bits, n_bands = signblock_params(thresh, target_recall=0.9)
    found = {
        (r.vec_a, r.vec_b)
        for r in neardup_pairs_signblock(
            planted, threshold=thresh, bits=bits, n_bands=n_bands
        ).collect()
    }
    out["neardup_planted_pairs"] = len(truth)
    out["neardup_lsh_params"] = f"{bits}bits_x_{n_bands}bands"
    out["neardup_recall_planted"] = round(len(found & truth) / len(truth), 4) if truth else 1.0
    return out


def measure_bucketed_join(wh_root: str, cpus: int) -> dict:
    """Bucketed-warehouse payoff (SURVEY §4.2.6 / VERDICT r1 #6): the
    provenance ⋈ chunks join over the plain parquet warehouse shuffles both
    sides; over the url-hash bucketed copy it plans with zero hash Exchange.
    Reports wall seconds + hash-exchange counts for both layouts. Wall times
    are single-run (VM steal noise up to 2x) — the exchange counts are the
    durable claim; at 100 TB the removed shuffle is the dominant cost."""
    from medical_doc_knowledge_graph_system_spark.operators.graph_queries import (
        provenance_citations,
    )
    from medical_doc_knowledge_graph_system_spark.plans.checks import (
        physical_plan_string,
    )
    from medical_doc_knowledge_graph_system_spark.sources.warehouse import Warehouse

    spark = get_spark(
        app_name="bench_bucketed",
        cores=cpus,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    plain = Warehouse(wh_root)
    bucketed = Warehouse(wh_root + "_bucketed")
    for t in ("provenance_edges", "chunks"):
        bucketed.write_bucketed(plain.read(spark, t), t, n_buckets=cpus)

    out: dict = {"n_buckets": cpus}
    for tag, wh in (("plain", plain), ("bucketed", bucketed)):
        cites = provenance_citations(
            wh.read(spark, "provenance_edges"), wh.read(spark, "chunks")
        )
        plan = physical_plan_string(cites)
        t0 = time.time()
        n = cites.count()
        out[tag] = {
            "wall_sec": round(time.time() - t0, 2),
            "rows": n,
            "hash_exchanges": plan.count("Exchange hashpartitioning"),
        }
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    pages_path = _pages_path(sf)

    result: dict = {"metric": "kg_pipeline_e2e", "unit": "sec", "sf": float(sf)}

    # median-of-REPS everywhere (VERDICT r2 #8): this VM's CPU-steal noise
    # reaches 2x between identical runs, so single-run numbers routinely
    # fake regressions/improvements; the headline is the per-item MEDIAN
    # across interleaved passes, with the raw runs kept alongside.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    def _median(xs: list[float]) -> float:
        ys = sorted(xs)
        mid = len(ys) // 2
        return ys[mid] if len(ys) % 2 else round((ys[mid - 1] + ys[mid]) / 2, 3)

    pipe_runs = [
        run_kg_pipeline(cpus, pages_path, f"main{cpus}_r{i}") for i in range(reps)
    ]
    pipe = sorted(pipe_runs, key=lambda p: p["wall_sec"])[len(pipe_runs) // 2]
    result["value"] = pipe["wall_sec"]
    result["pipeline"] = pipe
    result["pipeline_runs_sec"] = [p["wall_sec"] for p in pipe_runs]

    # headline queries: interleaved passes (pass 1 runs q1..qn, then pass 2,
    # ...), so a steal spike hits one PASS, not every sample of one query
    import __spark_entry__ as entry

    spark = get_spark(app_name="bench_queries", cores=cpus)
    qs = entry.queries()
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _pass in range(reps):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            _ = df.count()
            runs[name].append(round(time.time() - t0, 3))
    result["queries"] = {name: _median(runs[name]) for name in HEADLINE}
    result["query_runs"] = runs
    result["ann_recall"] = measure_ann_recall(spark, sf_dir)
    spark.stop()

    result["bucketed_join"] = measure_bucketed_join(
        f"/tmp/mdkgs_bench_wh_main{cpus}_r0", cpus
    )

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # N vs 4N cores on the same input, shuffle partitions pinned (on a
        # real cluster partitions are sized to data; executors vary). N=2 so
        # the N run is solidly compute-bound rather than job-latency-bound —
        # the sandbox analog of N vs 4N executors per BASELINE.json.
        n_cores = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        scale_pages = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "0"))
        scale_path = pages_path
        if scale_pages:
            cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
            scale_path = os.path.join(cache, f"pages_{scale_pages}.parquet")
            if not os.path.exists(scale_path):
                from medical_doc_knowledge_graph_system_spark.datagen import (
                    write_pages_parquet_spark,
                )

                s = get_spark(app_name="bench_gen", cores=cpus)
                write_pages_parquet_spark(s, scale_path, scale_pages)
                s.stop()
        # pin shuffle width to cover the BIGGER run (4N cores) so reduce-side
        # task count never caps parallelism; both runs share the pin so only
        # executor parallelism varies
        sp = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", str(max(16, 8 * n_cores))))
        lo = run_kg_pipeline(n_cores, scale_path, f"scale{n_cores}", shuffle_partitions=sp)
        hi = run_kg_pipeline(
            4 * n_cores, scale_path, f"scale{4 * n_cores}", shuffle_partitions=sp
        )
        eff = (lo["wall_sec"] / hi["wall_sec"]) / 4.0
        result["scaling"] = {
            f"local{n_cores}": lo,
            f"local{4 * n_cores}": hi,
            "speedup_N_to_4N": round(lo["wall_sec"] / hi["wall_sec"], 3),
            "efficiency": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()

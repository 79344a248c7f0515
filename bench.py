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
    "sim_topk",
    "sim_neardup",
    "sim_ivf_topk",
    "events_hourly",
    "events_sessions",
    "events_pivot",
    "tpch_pricing",
    "tpch_rollup",
    "tpch_top_customers",
    "docs_setops",
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    pages_path = _pages_path(sf)

    result: dict = {"metric": "kg_pipeline_e2e", "unit": "sec", "sf": float(sf)}

    pipe = run_kg_pipeline(cpus, pages_path, f"main{cpus}")
    result["value"] = pipe["wall_sec"]
    result["pipeline"] = pipe

    # headline queries
    import __spark_entry__ as entry

    spark = get_spark(app_name="bench_queries", cores=cpus)
    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    result["queries"] = timings
    spark.stop()

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
        lo = run_kg_pipeline(n_cores, scale_path, f"scale{n_cores}", shuffle_partitions=16)
        hi = run_kg_pipeline(
            4 * n_cores, scale_path, f"scale{4 * n_cores}", shuffle_partitions=16
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

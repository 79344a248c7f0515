"""Build a scaled-up copy of an sf dir for PERFORMANCE measurement only.

The driver's round-end bench may run at a larger sf than the local testdata
(BENCH_r05.json: sf=1.0, i.e. ~10x sf0.1). This tool replicates the sf0.1
tables K times with key offsets and mild deterministic perturbation so
optimizations can be validated at driver-bench scale. NOT for correctness
gates (oracles run on the real testdata only).

Usage: python tools/make_scaled_sf.py [--src /root/testdata/sf0.1]
         [--dst /root/repo/.cache/sfbig] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pandas as pd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.cache/sfbig")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    K = args.copies
    src, dst = args.src, args.dst

    # documents: replicate with doc_id offset; perturb one token per copy so
    # cross-copy pairs are near- (not exact-) duplicates, like fresh datagen
    docs = con.sql(f"select * from '{src}/documents.parquet'").df()
    n_docs = int(docs["doc_id"].max()) + 1
    out = []
    for k in range(K):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + n_docs * k
        if k > 0:
            def perturb(row_text, did, kk=k):
                toks = row_text.split(" ")
                i = (did * 31 + kk * 7) % len(toks)
                vocab = ["join", "scan", "filter", "sort", "merge", "agg", "window",
                         "group", "hash", "table", "row", "column", "key", "vector",
                         "line", "part", "spark", "stream", "batch", "query", "fast",
                         "slow", "small", "big", "data", "value", "order", "customer",
                         "a", "dim", "fact"]
                toks[i] = vocab[(did + kk * 13) % len(vocab)]
                return " ".join(toks)
            c["text"] = [perturb(t, d) for t, d in zip(c["text"], c["doc_id"])]
            c["n_chars"] = c["text"].str.len()
        out.append(c)
    pd.concat(out).to_parquet(f"{dst}/documents.parquet", index=False)

    # embeddings: replicate with vec_id offset + small deterministic noise
    emb = con.sql(f"select * from '{src}/embeddings.parquet'").df()
    n_emb = int(emb["vec_id"].max()) + 1
    out = []
    for k in range(K):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + n_emb * k
        if k > 0:
            rng = np.random.default_rng(1000 + k)
            c["embedding"] = [
                (np.asarray(v, dtype=np.float32) + 0.05 * rng.standard_normal(len(v)).astype(np.float32))
                for v in c["embedding"]
            ]
            c["embedding"] = [
                (v / np.linalg.norm(v)).astype(np.float32) for v in c["embedding"]
            ]
        out.append(c)
    pd.concat(out).to_parquet(f"{dst}/embeddings.parquet", index=False)

    # events: same calendar, 10x users
    n_ev = con.sql(f"select max(event_id)+1, max(user_id)+1 from '{src}/events.parquet'").fetchone()
    parts = " UNION ALL ".join(
        f"select event_id + {n_ev[0] * k} as event_id, ts, user_id + {n_ev[1] * k} as user_id,"
        f" event_type, value, props from '{src}/events.parquet'"
        for k in range(K)
    )
    con.sql(f"copy ({parts}) to '{dst}/events.parquet' (format parquet)")

    # tpch star: offset every key consistently per copy
    mx = {}
    for t, c in (("lineitem", "l_orderkey"), ("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey")):
        mx[t] = con.sql(f"select max({c})+1 from '{src}/{t}.parquet'").fetchone()[0]
    parts = " UNION ALL ".join(
        f"select l_orderkey + {mx['orders'] * k} as l_orderkey, l_partkey + {mx['part'] * k} as l_partkey,"
        f" l_suppkey + {mx['supplier'] * k} as l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
        f" l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate from '{src}/lineitem.parquet'"
        for k in range(K)
    )
    con.sql(f"copy ({parts}) to '{dst}/lineitem.parquet' (format parquet)")
    parts = " UNION ALL ".join(
        f"select o_orderkey + {mx['orders'] * k} as o_orderkey, o_custkey + {mx['customer'] * k} as o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority from '{src}/orders.parquet'"
        for k in range(K)
    )
    con.sql(f"copy ({parts}) to '{dst}/orders.parquet' (format parquet)")
    parts = " UNION ALL ".join(
        f"select c_custkey + {mx['customer'] * k} as c_custkey,"
        f" 'Customer#' || lpad(cast(c_custkey + {mx['customer'] * k} as varchar), 9, '0') as c_name,"
        f" c_nationkey, c_acctbal, c_mktsegment from '{src}/customer.parquet'"
        for k in range(K)
    )
    con.sql(f"copy ({parts}) to '{dst}/customer.parquet' (format parquet)")
    parts = " UNION ALL ".join(
        f"select p_partkey + {mx['part'] * k} as p_partkey, p_name, p_brand, p_type, p_size,"
        f" p_retailprice from '{src}/part.parquet'"
        for k in range(K)
    )
    con.sql(f"copy ({parts}) to '{dst}/part.parquet' (format parquet)")
    parts = " UNION ALL ".join(
        f"select s_suppkey + {mx['supplier'] * k} as s_suppkey,"
        f" 'Supplier#' || lpad(cast(s_suppkey + {mx['supplier'] * k} as varchar), 9, '0') as s_name,"
        f" s_nationkey, s_acctbal from '{src}/supplier.parquet'"
        for k in range(K)
    )
    con.sql(f"copy ({parts}) to '{dst}/supplier.parquet' (format parquet)")
    for t in ("nation", "region"):
        con.sql(f"copy (select * from '{src}/{t}.parquet') to '{dst}/{t}.parquet' (format parquet)")
    print("wrote", dst)


if __name__ == "__main__":
    main()

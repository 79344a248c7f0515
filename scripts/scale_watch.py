"""Calm-window watcher for the 800k-page N-vs-4N scaling pair.

This VM carries phantom load (loadavg 4-20 with /proc/stat near-idle; see
BENCH.md) that poisons wall-clock pairs. The reliable methodology from the
r5 sessions: poll the 1-minute loadavg and fire a pair only when it drops
below the gate, interleaving the two sides back-to-back inside the same
calm window. Appends one JSON line per pair to the --out file.

Run (detached): nohup python scripts/scale_watch.py --pairs 2 \
    --out /tmp/scale_watch.jsonl &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

PAGES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache",
    "pages_800000.parquet",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1)
    ap.add_argument("--gate", type=float, default=1.0)
    ap.add_argument("--poll-sec", type=int, default=60)
    ap.add_argument("--max-wait-sec", type=int, default=4 * 3600)
    ap.add_argument("--out", default="/tmp/scale_watch.jsonl")
    args = ap.parse_args()

    done = 0
    start = time.time()
    while done < args.pairs and time.time() - start < args.max_wait_sec:
        la1 = os.getloadavg()[0]
        if la1 >= args.gate:
            time.sleep(args.poll_sec)
            continue
        rec = {"loadavg_at_fire": round(la1, 2), "t": int(time.time())}
        lo = bench.run_kg_pipeline(2, PAGES, f"watch2_{done}", shuffle_partitions=16)
        rec["loadavg_mid"] = round(os.getloadavg()[0], 2)
        hi = bench.run_kg_pipeline(8, PAGES, f"watch8_{done}", shuffle_partitions=16)
        rec["loadavg_after"] = round(os.getloadavg()[0], 2)
        rec["local2"] = lo
        rec["local8"] = hi
        rec["speedup"] = round(lo["wall_sec"] / hi["wall_sec"], 3)
        rec["efficiency"] = round(lo["wall_sec"] / hi["wall_sec"] / 4.0, 3)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        done += 1
    print(json.dumps({"pairs_done": done}))


if __name__ == "__main__":
    main()

"""Parquet-backed warehouse with MERGE emulation, checkpoints and metrics.

Design target is partitioned Iceberg tables with MERGE INTO (SURVEY §4.2.6);
the sandbox has no Iceberg runtime jar, so this module implements the
documented fallback (SURVEY §7.3.4): partitioned parquet + upsert-by-rewrite
keyed on the same natural keys the reference enforces with uniqueness
constraints (app/graph/schema_setup.py:18-28). The API is Iceberg-shaped so
swapping `Warehouse` for a catalog is a one-module change.

Also owns the resumability contract (north_rule): `_checkpoints` records
stage completion and `_metrics` records per-partition row counts + wall time
(lineage / extraction-count metrics per partition).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Read a table; a table may be stored as url-hash partition-group
        shards (`name__g0`, `name__g1`, ...) written by group-checkpointed
        stages — transparently read as their union."""
        if self.exists(name):
            return spark.read.parquet(self.path(name))
        import glob

        shards = sorted(glob.glob(self.path(f"{name}__g*")))
        if shards:
            return spark.read.parquet(*shards)
        return spark.read.parquet(self.path(name))  # surface the normal error

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def merge_upsert(self, df: DataFrame, name: str, keys: list[str]) -> None:
        """MERGE INTO emulation: new rows win on key collision.

        Iceberg equivalent: MERGE INTO name USING df ON keys WHEN MATCHED
        THEN UPDATE WHEN NOT MATCHED THEN INSERT (reference upsert semantics:
        per-label MERGE in app/graph/queries.py:9-114).
        """
        spark = df.sparkSession
        if not self.exists(name):
            self.write(df.dropDuplicates(keys), name)
            return
        existing = self.read(spark, name)
        kept = existing.join(df.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(df.dropDuplicates(keys))
        tmp = self.path(f"__tmp_{name}")
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path(name))
        os.rename(tmp, self.path(name))

    def compact_table(
        self, spark: SparkSession, name: str, target_file_mb: int = 128
    ) -> int:
        """Coalesce a table's small files toward target_file_mb per file
        (streaming appends produce one file per microbatch; at scale this is
        the standard maintenance op — Iceberg's rewrite_data_files).
        Returns the new file count."""
        import glob

        p = self.path(name)
        size = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
        )
        n_files = max(1, round(size / (target_file_mb * 1024 * 1024)))
        df = self.read(spark, name)
        tmp = self.path(f"__tmp_{name}")
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(p)
        os.rename(tmp, p)
        return n_files

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)

    # -- checkpoints & per-partition metrics (north_rule resumability) --------

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.jsonl")

    def checkpoint_done(self, stage: str) -> bool:
        p = self._meta_path("_checkpoints")
        if not os.path.exists(p):
            return False
        done = False
        with open(p) as f:
            for line in f:
                rec = json.loads(line)
                if rec["stage"] == stage:
                    done = rec["status"] == "complete"
        return done

    def mark_checkpoint(self, stage: str, status: str, rows: int, wall_ms: float) -> None:
        with open(self._meta_path("_checkpoints"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "stage": stage,
                        "status": status,
                        "rows": rows,
                        "wall_ms": round(wall_ms, 1),
                        "finished_at": time.time(),
                    }
                )
                + "\n"
            )

    def log_partition_metrics(self, spark: SparkSession, stage: str, table: str) -> int:
        """Per-partition lineage: rows per written partition (= output file)
        of the table, appended to _metrics.jsonl. Reads parquet footers with
        pyarrow — zero Spark jobs, O(files) metadata reads. Returns total
        rows."""
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(self.path(table), "**", "*.parquet"), recursive=True))
        total = 0
        with open(self._meta_path("_metrics"), "a") as f:
            for i, fp in enumerate(files):
                n = pq.ParquetFile(fp).metadata.num_rows
                total += n
                f.write(
                    json.dumps(
                        {
                            "stage": stage,
                            "table": table,
                            "partition_id": i,
                            "file": os.path.basename(fp),
                            "rows": n,
                            "logged_at": time.time(),
                        }
                    )
                    + "\n"
                )
        return total

    def reset_meta(self) -> None:
        for name in ("_checkpoints", "_metrics"):
            p = self._meta_path(name)
            if os.path.exists(p):
                os.remove(p)

"""Bucket-partial incremental view maintenance over the CDC feed.

A copy-on-write warehouse emits no before-images, which rules out classic
delta-based IVM (you cannot subtract rows you never saw leave). But the
warehouse's rewrite unit IS the bucket: a commit replaces whole bucket
files and logs their ids (warehouse.changed_log). So an aggregate view
keyed below the bucket column can be maintained exactly by storing one
PARTIAL aggregate per bucket and, each poll, recomputing partials for the
changed buckets only — before-images become unnecessary because the stale
partials are simply replaced. This is how Iceberg-native materialized
views refresh against a partition-granular change log; reference
analogue: the aggregate endpoints around `app/services/graph_service.py`
(get_statistics) kept warm against a table too large to re-aggregate per
request.

Cost model at 100 TB: a poll touches O(changed buckets) data + an
O(n_buckets x groups) partial merge — never the full table, except when
the CDC window is unprovable (full rewrite / log horizon), where it
degrades to a full rebuild that is still just one aggregation pass.

Crash contract: partials are written BEFORE the watermark file flips
(tmp+rename, the warehouse's own commit idiom), so a crash between them
replays the same changed-bucket window — refresh is idempotent because
partial recomputation is a pure overwrite of the same bucket partitions.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .warehouse import Warehouse

BUCKET_COL = "__bucket"


class BucketAggView:
    """An incrementally-maintained aggregate over a bucketed warehouse
    table.

    partial_fn(df) -> DataFrame: the per-bucket partial aggregate; its
      input carries the source rows PLUS the `__bucket` id column, and its
      output MUST keep `__bucket` as a grouping column (e.g.
      ``df.groupBy("__bucket", "label").agg(F.count(F.lit(1)).alias("c"))``).
    merge_fn(partials) -> DataFrame: folds the per-bucket partials into
      the view result (e.g. ``p.groupBy("label").agg(F.sum("c").alias("n"))``)
      — the partial/merge split must satisfy the usual algebraic-aggregate
      law (merge of partials == aggregate of the union), which is the same
      contract Spark's own map-side partial aggregation relies on.
    """

    def __init__(
        self,
        wh: Warehouse,
        table: str,
        partial_fn: Callable[[DataFrame], DataFrame],
        merge_fn: Callable[[DataFrame], DataFrame],
        state_dir: str,
    ) -> None:
        self.wh = wh
        self.table = table
        self.partial_fn = partial_fn
        self.merge_fn = merge_fn
        self.state_dir = state_dir
        self.partials_dir = os.path.join(state_dir, "partials")

    # -- state ------------------------------------------------------------
    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "state.json")

    def watermark(self) -> int | None:
        try:
            with open(self._state_path()) as f:
                return json.load(f)["watermark"]
        except FileNotFoundError:
            return None

    def _commit_watermark(self, version: int) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"watermark": version, "table": self.table}, f)
        os.replace(tmp, self._state_path())

    # -- refresh ----------------------------------------------------------
    def refresh(self, spark: SparkSession) -> DataFrame:
        """Bring the view up to the table's current committed version and
        return the merged result. Recomputes partials ONLY for buckets the
        committed change log proves rewritten since the last refresh
        (everything, on first build or an unprovable window)."""
        cur = self.wh.current_version(self.table)
        wm = self.watermark()
        if wm == cur and os.path.isdir(self.partials_dir):
            return self.merge_fn(spark.read.parquet(self.partials_dir))
        changed = (
            None if wm is None
            else self.wh.changed_buckets_since(self.table, wm)
        )
        meta = self.wh._bucket_meta(self.table)
        if changed is None:
            # first build / unprovable window: every bucket's partial is
            # stale — rebuild the whole partial store in one pass
            changed = set(range(meta["n_buckets"]))
            shutil.rmtree(self.partials_dir, ignore_errors=True)
        if changed:
            rows = self.wh.read_buckets(spark, self.table, changed)
            rows = rows.withColumn(
                BUCKET_COL,
                F.regexp_extract(
                    F.input_file_name(), r"_(\d{5})\.c\d+", 1
                ).cast("int"),
            )
            partials = self.partial_fn(rows)
            if BUCKET_COL not in partials.columns:
                raise ValueError(
                    f"partial_fn must keep the {BUCKET_COL!r} grouping column"
                )
            # dynamic partition overwrite: only the changed buckets'
            # partition dirs are replaced, untouched partials stay put
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    # hash-repartition on the bucket id: each partition dir
                    # is written by one task -> one partial file per bucket
                    partials.repartition(F.col(BUCKET_COL))
                    .write.mode("overwrite")
                    .partitionBy(BUCKET_COL)
                    .parquet(self.partials_dir)
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            # a bucket can be rewritten to EMPTY (every row upserted away):
            # dynamic overwrite only replaces partitions present in the new
            # data, so an emptied bucket's stale partial must be dropped
            # explicitly
            written = {
                int(d.split("=", 1)[1])
                for d in os.listdir(self.partials_dir)
                if d.startswith(f"{BUCKET_COL}=")
            }
            for b in changed - written:
                shutil.rmtree(
                    os.path.join(self.partials_dir, f"{BUCKET_COL}={b}"),
                    ignore_errors=True,
                )
        os.makedirs(self.partials_dir, exist_ok=True)
        self._commit_watermark(cur)
        return self.merge_fn(spark.read.parquet(self.partials_dir))

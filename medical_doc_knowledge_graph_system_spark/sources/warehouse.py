"""Parquet-backed warehouse with MERGE emulation, checkpoints and metrics.

Design target is partitioned Iceberg tables with MERGE INTO (SURVEY §4.2.6);
the sandbox has no Iceberg runtime jar, so this module implements the
documented fallback (SURVEY §7.3.4): partitioned parquet + upsert-by-rewrite
keyed on the same natural keys the reference enforces with uniqueness
constraints (app/graph/schema_setup.py:18-28). The API is Iceberg-shaped so
swapping `Warehouse` for a catalog is a one-module change. Bucketed tables
commit via Iceberg-style snapshots: versioned data dirs + an atomic pointer
flip, with untouched bucket files hardlinked between snapshots.

Also owns the resumability contract (north_rule): `_checkpoints` records
stage completion and `_metrics` records per-partition row counts + wall time
(lineage / extraction-count metrics per partition).
"""

from __future__ import annotations

import hashlib
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
        if os.path.exists(self._bucket_meta_path(name)):
            return os.path.exists(
                os.path.join(self.current_data_dir(name), "_SUCCESS")
            )
        p = self.path(name)
        return os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Read a table; a table may be stored as url-hash partition-group
        shards (`name__g0`, `name__g1`, ...) written by group-checkpointed
        stages — transparently read as their union. Tables written with
        write_bucketed are read through the catalog so their bucketing
        survives into the plan (shuffle-free joins/windows on the bucket
        key)."""
        if os.path.exists(self._bucket_meta_path(name)):
            return self.read_bucketed(spark, name)
        if self.exists(name):
            return spark.read.parquet(self.path(name))
        import glob

        shards = sorted(glob.glob(self.path(f"{name}__g*")))
        if shards:
            return spark.read.parquet(*shards)
        return spark.read.parquet(self.path(name))  # surface the normal error

    # -- bucketed tables (Iceberg bucket-partitioning analogue) ---------------
    #
    # SURVEY §4.2.6 targets Iceberg `bucket(N, url)` partitioning so that
    # chunk-family joins co-locate without a shuffle. No Iceberg jar exists in
    # this sandbox, so the same physical property is obtained with Spark's
    # native bucketed tables: saveAsTable + bucketBy/sortBy, registered in the
    # session catalog with the data files at an external LOCATION under the
    # warehouse root. A restarted session re-registers the table from the
    # persisted bucket spec (the reference's 9 uniqueness constraints,
    # app/graph/schema_setup.py:18-28, are the natural-key analogue).
    #
    # Commits are SNAPSHOT-ATOMIC (Iceberg's snapshot model, r3): each write
    # materializes a fresh version directory `name/v<N>/`; the persisted
    # bucket spec (`name.bucket.json`, written tmp+rename) is the snapshot
    # pointer and its flip is the single commit point. A crash mid-write
    # leaves the previous version untouched and readable; an orphaned
    # half-built version dir is swept by the next writer. Bucket-targeted
    # merges HARDLINK untouched bucket files into the new version (O(1) per
    # untouched bucket), so the Iceberg-style snapshot costs nothing extra.

    def _table_ident(self, name: str, version: int = 0) -> str:
        # catalog is session-global; qualify by warehouse root so two
        # Warehouse instances in one session can't collide. The version is
        # part of the identity: a snapshot flip registers a NEW table, so no
        # stale file-listing cache or REFRESH is ever needed.
        tag = hashlib.md5(os.path.abspath(self.root).encode()).hexdigest()[:8]
        suffix = f"_v{version}" if version else ""
        return f"bw_{tag}_{name}{suffix}"

    def _bucket_meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.bucket.json")

    def _bucket_meta(self, name: str) -> dict | None:
        p = self._bucket_meta_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_bucket_meta(self, name: str, meta: dict) -> None:
        # tmp + rename: the atomic snapshot-pointer flip
        p = self._bucket_meta_path(name)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, p)

    @staticmethod
    def _build_manifest(data_dir: str, carry: dict | None = None) -> dict:
        """File manifest of a just-built snapshot dir: {basename: file_id}.

        file_id is a commit-time identity (Iceberg's data-file entry id
        analogue): files carried over unchanged from the previous snapshot
        (hardlinked untouched buckets — recognizable by basename, since Spark
        stamps a fresh job UUID into every newly staged file name) KEEP their
        previous id; newly written files get a fresh one. The manifest lives
        in the committed meta, so the change feed (read_incremental) is pure
        metadata — portable to object stores where inodes don't exist."""
        import glob
        import uuid

        carry = carry or {}
        return {
            os.path.basename(f): carry.get(os.path.basename(f), uuid.uuid4().hex)
            for f in glob.glob(os.path.join(data_dir, "*.parquet"))
        }

    # changed-bucket log entries retained in the committed meta (bounded so
    # meta stays O(1); a consumer further behind than this gets the safe
    # full-table superset)
    CHANGED_LOG_KEEP = 64

    @classmethod
    def _append_changed_log(
        cls, meta: dict, new_ver: int, base_ver: int, buckets: list[int] | str
    ) -> dict:
        """Per-commit CDC log: {version(str): {"base": prev committed
        version, "buckets": [bucket ids] | "full"}}. "base" chains commits
        (claim-skipped orphan numbers never enter the log), letting
        read_changes_since verify an unbroken window; "full" marks a
        whole-table rewrite (write_bucketed)."""
        log = dict(meta.get("changed_log", {}))
        log[str(new_ver)] = {"base": base_ver, "buckets": buckets}
        if len(log) > cls.CHANGED_LOG_KEEP:
            for k in sorted(log, key=int)[: len(log) - cls.CHANGED_LOG_KEEP]:
                del log[k]
        return log

    def _version_dir(self, name: str, version: int) -> str:
        """Data dir of snapshot `version` (0 = legacy unversioned layout)."""
        return (
            os.path.join(self.path(name), f"v{version}")
            if version
            else self.path(name)
        )

    def current_data_dir(self, name: str) -> str:
        meta = self._bucket_meta(name)
        return self._version_dir(name, (meta or {}).get("version", 0))

    # snapshots retained besides the current one: the previous snapshot stays
    # readable (in-flight-reader grace + time travel, Iceberg's
    # expire_snapshots model) and costs only the files the last commit
    # actually rewrote — untouched bucket files are hardlinks sharing bytes.
    KEEP_SNAPSHOTS = 1

    def _sweep_stale_versions(self, spark: SparkSession, name: str) -> None:
        """Remove version dirs (and catalog entries) STRICTLY BELOW the
        retention window (older than current - KEEP_SNAPSHOTS), plus orphaned
        .stage-* dirs older than _STAGE_ORPHAN_SECS. Versions ABOVE current
        are never touched: they may be another writer's just-claimed commit
        whose pointer flip is in flight (see _claim_version) — they become
        sweepable naturally once the version counter passes them."""
        import glob
        import re
        import time as _time

        meta = self._bucket_meta(name)
        cur = (meta or {}).get("version", 0)
        # sweep strictly below the recorded base of the last commit
        # (prev_version, NOT cur-1: rename-claimed numbers may leave crash
        # orphans between base and cur). Numbers in [prev, cur] are never
        # touched — one of them may be a concurrent writer's claimed-but-
        # not-yet-flipped snapshot (its claim started at its base+1 and its
        # base was <= our prev at claim time); an orphan in that band is
        # reaped one commit later when the base moves past it.
        keep_min = (meta or {}).get("prev_version", cur - 1)
        for d in glob.glob(os.path.join(self.path(name), "v*")):
            m = re.fullmatch(r"v(\d+)", os.path.basename(d))
            if m and int(m.group(1)) < keep_min:
                spark.sql(
                    f"DROP TABLE IF EXISTS {self._table_ident(name, int(m.group(1)))}"
                )
                shutil.rmtree(d, ignore_errors=True)
        for d in glob.glob(os.path.join(self.path(name), ".stage-*")):
            try:
                if _time.time() - os.path.getmtime(d) > self._STAGE_ORPHAN_SECS:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass  # another writer claimed or swept it mid-check

    # a .stage-* dir this old can only be a crashed writer's leftover
    _STAGE_ORPHAN_SECS = 3600

    def _stage_dir(self, name: str) -> str:
        import uuid

        os.makedirs(self.path(name), exist_ok=True)
        return os.path.join(self.path(name), f".stage-{uuid.uuid4().hex[:12]}")

    def _claim_version(self, name: str, stage: str, start: int) -> int:
        """Atomically promote a fully-built stage dir to the lowest free
        version number >= start via os.rename (fails if the target exists —
        POSIX rename onto a non-empty dir is ENOTEMPTY), so two concurrent
        writers can NEVER interleave files inside one version dir. Combined
        with the tmp+rename pointer flip this gives last-committer-wins with
        no torn snapshot: each v<N>/ is written by exactly one writer and is
        complete (_SUCCESS included) before it becomes visible; concurrent
        writers that both started from the same base version race only on
        the pointer flip, and the loser's committed rows are superseded
        whole (the documented lost-update window — writers wanting
        serialized merges must coordinate externally; there is no
        compare-and-swap on the pointer)."""
        import errno

        ver = start
        while True:
            target = os.path.join(self.path(name), f"v{ver}")
            try:
                os.rename(stage, target)
                return ver
            except OSError as e:
                # only an occupied target means "claimed by another writer /
                # crash orphan — try the next number". Anything else (stage
                # dir gone, EACCES, ...) would loop forever: re-raise.
                if e.errno not in (errno.ENOTEMPTY, errno.EEXIST):
                    raise
                ver += 1

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        n_buckets: int,
        bucket_col: str = "url",
        sort_col: str | None = None,
    ) -> None:
        """Write `name` as a Spark bucketed table: hash-bucketed on
        `bucket_col` into `n_buckets` files, sorted by `sort_col` within each
        bucket (file-level min/max stats -> file skipping on point lookups).

        The pre-write repartition uses the same HashPartitioning the bucketed
        writer requires, so each task owns exactly one bucket -> one file per
        bucket, which is what lets downstream scans report both the hash
        partitioning AND the sort order (no Sort before a sort-merge join).

        Snapshot-atomic AND concurrent-writer-safe (r4): the table
        materializes into a UNIQUE `.stage-<uuid>/` dir, is atomically
        promoted to the lowest free `v<N>/` (_claim_version — rename fails
        on an existing target, so no two writers ever share a version dir),
        and the bucket-spec pointer flip (tmp+rename) is the commit. A
        mid-write failure leaves the previous snapshot intact and readable;
        concurrent writers serialize to last-committer-wins (see
        _claim_version for the documented lost-update window)."""
        sort_col = sort_col or bucket_col
        spark = df.sparkSession
        old_meta = self._bucket_meta(name)
        old_ver = (old_meta or {}).get("version", 0)
        had_plain = old_meta is None and self.exists(name)
        stage = self._stage_dir(name)
        # the stage catalog ident is transient: dropped right after the
        # write; the committed version's ident is (re)created lazily by
        # read_bucketed from the persisted spec, so nothing in the catalog
        # can point at a pre-claim path
        stage_tbl = f"{self._table_ident(name)}_stage_{os.path.basename(stage)[7:]}"
        from pyspark.sql import functions as F

        (
            df.repartition(n_buckets, F.col(bucket_col))
            .write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(sort_col)
            .option("path", stage)
            .saveAsTable(stage_tbl)
        )
        schema_json = spark.table(stage_tbl).schema.json()
        spark.sql(f"DROP TABLE IF EXISTS {stage_tbl}")
        new_ver = self._claim_version(name, stage, old_ver + 1)
        # COMMIT: flip the snapshot pointer, then sweep superseded state
        self._write_bucket_meta(
            name,
            {
                "version": new_ver,
                # the committed lineage: time travel / sweeping trust this,
                # never the arithmetic cur-1 (a claim-skipped number may be
                # a crash orphan, not a snapshot)
                "prev_version": old_ver,
                "n_buckets": n_buckets,
                "bucket_col": bucket_col,
                "sort_col": sort_col,
                "schema_json": schema_json,
                # full rewrite: every file is new (no carry-over ids)
                "manifest": self._build_manifest(
                    self._version_dir(name, new_ver)
                ),
                "prev_manifest": (old_meta or {}).get("manifest", {}),
                "changed_log": self._append_changed_log(
                    old_meta or {}, new_ver, old_ver, "full"
                ),
            },
        )
        if old_meta is not None:
            spark.sql(f"DROP TABLE IF EXISTS {self._table_ident(name)}")
        if had_plain:
            # plain table being converted: its files sit at the table root
            import glob

            for f in glob.glob(os.path.join(self.path(name), "*")):
                if not os.path.basename(f).startswith("v"):
                    (shutil.rmtree if os.path.isdir(f) else os.remove)(f)
        self._sweep_stale_versions(spark, name)

    def read_bucketed(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame:
        """Read a snapshot of a bucketed table (current by default),
        re-registering it in the catalog from the persisted bucket spec if
        needed (fresh session / post-commit): the version is part of the
        table identity, so a reader can never see a half-flipped snapshot or
        a stale file listing. `version` time-travels to a retained previous
        snapshot (KEEP_SNAPSHOTS back; older ones are swept)."""
        meta = self._bucket_meta(name)
        if meta is None:
            raise FileNotFoundError(
                f"no bucketed table {name!r} in warehouse {self.root!r}"
            )
        cur = meta.get("version", 0)
        ver = cur if version is None else version
        if version is not None and version not in {
            cur,
            meta.get("prev_version", cur - 1),
        }:
            # only the COMMITTED lineage is addressable: a claim-skipped
            # number may hold a crash orphan with a plausible-looking
            # _SUCCESS that was never a committed snapshot
            raise FileNotFoundError(
                f"v{version} of table {name!r} is not a retained committed "
                f"snapshot (KEEP_SNAPSHOTS={self.KEEP_SNAPSHOTS})"
            )
        vdir = self._version_dir(name, ver)
        if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
            raise FileNotFoundError(
                f"snapshot v{ver} of table {name!r} is not retained "
                f"(KEEP_SNAPSHOTS={self.KEEP_SNAPSHOTS})"
            )
        tbl = self._table_ident(name, ver)
        if not spark.catalog.tableExists(tbl):
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
            spark.sql(
                f"CREATE TABLE {tbl} ({schema.toDDL()}) USING PARQUET "
                f"CLUSTERED BY ({meta['bucket_col']}) "
                f"SORTED BY ({meta['sort_col']}) "
                f"INTO {meta['n_buckets']} BUCKETS "
                f"LOCATION '{vdir}'"
            )
        return spark.table(tbl)

    def read_incremental(self, spark: SparkSession, name: str) -> DataFrame:
        """Rows of the buckets the LAST commit rewrote — the Iceberg
        snapshot-incremental read (VERDICT r3 #4's remaining catalog-surface
        gap). The change feed is PURE METADATA (r5): every commit records a
        file manifest {basename: file_id} in the bucket meta, where carried
        (hardlinked-untouched) files keep their previous id and rewritten
        buckets' files get fresh ones; the diff of the committed manifest vs
        the committed prev_manifest IS the changed-file set. No inode or
        filesystem inspection — portable to object stores, and immune to
        crash orphans occupying claim-skipped version numbers (the manifests
        come from the committed lineage, never from version arithmetic).
        Cost is O(changed files) scan only — a downstream consumer
        (re-embedding, index refresh, CDC-ish fanout) re-processes k/N of
        the table after a merge touching k buckets, never the whole table.

        Granularity is the bucket: a rewritten bucket's rows include
        unchanged rows that share the bucket (same as Iceberg's
        copy-on-write file granularity). A fresh table (v1, nothing
        retained) is entirely new, so all rows return. A pre-manifest
        (legacy) meta falls back to the hardlink-inode diff against the
        COMMITTED prev_version snapshot."""
        import glob

        meta = self._bucket_meta(name)
        if meta is None:
            raise FileNotFoundError(
                f"no bucketed table {name!r} in warehouse {self.root!r}"
            )
        cur = meta.get("version", 0)
        cur_dir = self._version_dir(name, cur)
        manifest = meta.get("manifest")
        if manifest is not None:
            prev_manifest = meta.get("prev_manifest", {})
            changed = sorted(
                os.path.join(cur_dir, base)
                for base, fid in manifest.items()
                if prev_manifest.get(base) != fid
            )
        else:
            # legacy meta (committed before manifests existed): hardlink-inode
            # diff vs the COMMITTED previous snapshot — prev_version, never
            # cur-1, which may be a crash orphan dir (ADVICE r4)
            cur_files = sorted(glob.glob(os.path.join(cur_dir, "*.parquet")))
            prev = meta.get("prev_version", cur - 1)
            prev_dir = self._version_dir(name, prev)
            prev_inodes = {
                os.stat(f).st_ino
                for f in glob.glob(os.path.join(prev_dir, "*.parquet"))
            } if prev >= 1 and os.path.exists(prev_dir) else set()
            changed = [
                f for f in cur_files if os.stat(f).st_ino not in prev_inodes
            ]
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        if not changed:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*changed)

    def current_version(self, name: str) -> int:
        """The committed snapshot version — a CDC consumer's watermark:
        record it BEFORE processing, pass it to read_changes_since next
        poll."""
        meta = self._bucket_meta(name)
        if meta is None:
            raise FileNotFoundError(
                f"no bucketed table {name!r} in warehouse {self.root!r}"
            )
        return meta.get("version", 0)

    def changed_buckets_since(
        self, name: str, since_version: int
    ) -> set[int] | None:
        """Bucket ids rewritten by ANY commit in (since_version, current]
        from the committed changed_log alone — the metadata half of
        read_changes_since, exposed for consumers that maintain their own
        per-bucket state (bucket-partial incremental view maintenance).
        Returns the (possibly empty) id set, or None when the window
        cannot be proven bucket-exact (full-rewrite commit inside it, a
        window past the bounded log, pre-CDC meta, or a since_version not
        on the committed chain) — callers must treat None as ALL buckets."""
        meta = self._bucket_meta(name)
        if meta is None:
            raise FileNotFoundError(
                f"no bucketed table {name!r} in warehouse {self.root!r}"
            )
        cur = meta.get("version", 0)
        if since_version >= cur:
            return set()
        log = meta.get("changed_log", {})
        buckets: set[int] = set()
        v = cur
        while v > since_version:
            ent = log.get(str(v))
            if ent is None or ent["buckets"] == "full":
                return None
            buckets.update(ent["buckets"])
            v = ent["base"]
        if v != since_version:
            return None
        return buckets

    def read_buckets(
        self, spark: SparkSession, name: str, bucket_ids: set[int]
    ) -> DataFrame:
        """Current rows of exactly the given buckets (empty frame for an
        empty id set / buckets holding no rows) — the data half of the
        CDC read, for bucket-granular consumers."""
        import glob

        meta = self._bucket_meta(name)
        if meta is None:
            raise FileNotFoundError(
                f"no bucketed table {name!r} in warehouse {self.root!r}"
            )
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        cur = meta.get("version", 0)
        files = [
            f
            for f in glob.glob(
                os.path.join(self._version_dir(name, cur), "*.parquet")
            )
            if self._bucket_id_of_file(f) in bucket_ids
        ]
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*sorted(files))

    def read_changes_since(
        self, spark: SparkSession, name: str, since_version: int
    ) -> DataFrame:
        """Current rows of every bucket rewritten by ANY commit after
        `since_version` — the multi-commit catch-up read a polling CDC
        consumer needs (read_incremental only covers the LAST commit).
        Pure committed metadata: each commit logs its touched bucket ids
        (changed_log); the union of entries in (since_version, current]
        maps to the CURRENT snapshot's files of those buckets, so a
        consumer that slept through k commits reads each changed bucket
        once at its latest content — Iceberg's incremental scan with
        overwrite semantics, at bucket (copy-on-write file) granularity.

        Falls back to the full current table when the window cannot be
        proven bucket-exact: a full-rewrite commit ("full" entry) in the
        window (every bucket really did change), a window reaching past
        the bounded log, a pre-CDC-log meta, or a since_version not on
        the committed chain. The fallback is always a correct superset.

        The chain walk lives in changed_buckets_since (shared with the
        bucket-partial IVM consumer); this method adds the data read."""
        buckets = self.changed_buckets_since(name, since_version)
        if buckets is None:
            return self.read_bucketed(spark, name)
        return self.read_buckets(spark, name, buckets)

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        meta = self._bucket_meta(name)
        if meta is not None and mode == "append":
            # appending plain files at the table root would leave the existing
            # rows stranded in v<N>/ snapshot dirs the root-level read never
            # sees — silently "losing" the table's prior contents
            raise ValueError(
                f"cannot append plain files to bucketed table {name!r}; "
                "use merge_upsert/write_bucketed, or write(mode='overwrite') "
                "to retire the bucket layout first"
            )
        if meta is not None:
            # plain write over a previously bucketed table: retire the bucket
            # spec + catalog entry, or later reads would scan plain files
            # under a CLUSTERED BY claim the files no longer honor
            df.sparkSession.sql(
                f"DROP TABLE IF EXISTS {self._table_ident(name, meta.get('version', 0))}"
            )
            os.remove(self._bucket_meta_path(name))
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def merge_upsert(self, df: DataFrame, name: str, keys: list[str]) -> None:
        """MERGE INTO emulation: new rows win on key collision.

        Iceberg equivalent: MERGE INTO name USING df ON keys WHEN MATCHED
        THEN UPDATE WHEN NOT MATCHED THEN INSERT (reference upsert semantics:
        per-label MERGE in app/graph/queries.py:9-114).

        Cost shape: when the table is bucketed and the bucket column is part
        of the merge keys, only the bucket files the incoming rows hash into
        are read + rewritten (Iceberg's merge-on-read/partition-rewrite
        analogue) — an incremental upsert touching k of N buckets costs
        O(k/N * table), not O(table). Untouched bucket files are left
        byte-identical. Plain (unbucketed) tables, and merges whose keys
        can't localize a bucket, fall back to the full anti-join + rewrite.
        """
        spark = df.sparkSession
        if not self.exists(name):
            self.write(df.dropDuplicates(keys), name)
            return
        meta = self._bucket_meta(name)
        if meta is not None:
            if meta["bucket_col"] in keys:
                self._merge_upsert_bucketed(df, name, keys, meta)
                return
            # keys can't localize buckets: full merge, preserving the layout
            # (Iceberg MERGE INTO keeps bucket partitioning; so do we)
            existing = self.read(spark, name)
            kept = existing.join(df.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(df.dropDuplicates(keys))
            tmp = self.path(f"__tmp_{name}")
            merged.write.mode("overwrite").parquet(tmp)
            self.write_bucketed(
                spark.read.parquet(tmp),
                name,
                n_buckets=meta["n_buckets"],
                bucket_col=meta["bucket_col"],
                sort_col=meta["sort_col"],
            )
            shutil.rmtree(tmp)
            return
        existing = self.read(spark, name)
        kept = existing.join(df.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(df.dropDuplicates(keys))
        tmp = self.path(f"__tmp_{name}")
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path(name))
        os.rename(tmp, self.path(name))

    @staticmethod
    def _bucket_id_of_file(path: str) -> int:
        """Bucket id from Spark's bucketed-file naming
        (part-NNNNN-<uuid>_<bucket>.c000...)."""
        import re

        m = re.search(r"_(\d{5})\.c\d+", os.path.basename(path))
        if not m:
            raise ValueError(f"not a bucketed data file: {path}")
        return int(m.group(1))

    def _merge_upsert_bucketed(
        self, df: DataFrame, name: str, keys: list[str], meta: dict
    ) -> None:
        """Bucket-targeted MERGE: read/rewrite ONLY the buckets the incoming
        rows hash into. Valid because Spark's bucket id is
        pmod(murmur3(bucket_col), n) — the same hash F.hash exposes — so the
        touched-bucket set is computable from df alone (verified empirically
        by tests/test_warehouse.py::test_bucketed_merge_touches_only_hit_buckets).

        Snapshot-atomic (Iceberg's model): untouched bucket files HARDLINK
        into a fresh version dir (O(1) per file, byte-identical by
        construction), merged buckets get new files there, and the bucket-spec
        pointer flip commits the whole merge at once — a crash at any point
        leaves the previous snapshot fully intact.
        """
        import glob

        from pyspark.sql import functions as F

        spark = df.sparkSession
        n, bcol, scol = meta["n_buckets"], meta["bucket_col"], meta["sort_col"]
        old_ver = meta.get("version", 0)
        cur_dir = self.current_data_dir(name)
        touched = sorted(
            r.b
            for r in df.select(
                F.pmod(F.hash(F.col(bcol)), F.lit(n)).alias("b")
            )
            .distinct()
            .collect()
        )
        by_bucket: dict[int, list[str]] = {}
        for f in glob.glob(os.path.join(cur_dir, "*.parquet")):
            by_bucket.setdefault(self._bucket_id_of_file(f), []).append(f)
        touched_files = [f for b in touched for f in by_bucket.get(b, [])]

        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        missing = set(schema.fieldNames()) - set(df.columns)
        extra = set(df.columns) - set(schema.fieldNames())
        if missing or extra:
            # explicit, not silent: the later select(*fieldNames) would drop
            # unexpected incoming columns without a trace
            raise ValueError(
                f"merge schema mismatch for {name!r}: missing {sorted(missing)}, "
                f"unexpected {sorted(extra)} (schema evolution is not supported "
                "on merge; rewrite with write_bucketed)"
            )
        existing_touched = (
            spark.read.schema(schema).parquet(*touched_files)
            if touched_files
            else spark.createDataFrame([], schema)
        )
        kept = existing_touched.join(df.select(*keys).distinct(), keys, "left_anti")
        # localCheckpoint is a plan barrier, not just a cache: Catalyst pushes
        # RepartitionByExpression through a Union into both branches, whose
        # partition lists then CONCATENATE (each bucket split across two write
        # tasks -> two files per touched bucket). The barrier keeps the
        # repartition where written, so the stage write emits exactly one
        # correctly-named file per touched bucket. Materialization cost is
        # O(touched buckets), the data being rewritten anyway.
        merged = kept.unionByName(
            df.select(*schema.fieldNames()).dropDuplicates(keys)
        ).localCheckpoint()

        # stage the merged touched-bucket rows as a bucketed table with the
        # SAME spec into a unique .stage-<uuid> dir: bucket hashing is
        # deterministic, so it holds exactly one correctly-named file per
        # touched bucket. The COMPLETE snapshot (merged buckets + hardlinked
        # untouched buckets) is assembled in the stage before the atomic
        # rename-claim, so a version dir is all-or-nothing even under
        # concurrent writers (r4; see _claim_version).
        stage = self._stage_dir(name)
        stage_tbl = f"{self._table_ident(name)}_stage_{os.path.basename(stage)[7:]}"
        (
            merged.repartition(n, F.col(bcol))
            .write.mode("overwrite")
            .bucketBy(n, bcol)
            .sortBy(scol)
            .option("path", stage)
            .saveAsTable(stage_tbl)
        )
        spark.sql(f"DROP TABLE IF EXISTS {stage_tbl}")
        stage_buckets = {
            self._bucket_id_of_file(f)
            for f in glob.glob(os.path.join(stage, "*.parquet"))
        }
        if not stage_buckets <= set(touched):
            # unconditional (not an assert, which vanishes under python -O):
            # a diverged hash contract would silently drop rows from future
            # merges that only read the buckets they compute as touched
            raise RuntimeError(
                f"staged rows landed outside touched buckets: "
                f"{stage_buckets - set(touched)}"
            )
        # hardlink every untouched bucket file into the staged snapshot (same
        # filesystem by construction; O(1) per file, shares the bytes)
        for b, files in by_bucket.items():
            if b not in touched:
                for f in files:
                    os.link(f, os.path.join(stage, os.path.basename(f)))
        new_ver = self._claim_version(name, stage, old_ver + 1)
        # COMMIT: flip the snapshot pointer, then sweep the old version.
        # Hardlinked untouched buckets keep their previous file ids (their
        # basenames survive the link), so read_incremental sees exactly the
        # merged buckets as changed.
        self._write_bucket_meta(
            name,
            {
                **meta,
                "version": new_ver,
                "prev_version": old_ver,
                "manifest": self._build_manifest(
                    self._version_dir(name, new_ver),
                    carry=meta.get("manifest", {}),
                ),
                "prev_manifest": meta.get("manifest", {}),
                "changed_log": self._append_changed_log(
                    meta, new_ver, old_ver, [int(b) for b in touched]
                ),
            },
        )
        spark.sql(f"DROP TABLE IF EXISTS {self._table_ident(name, old_ver)}")
        if old_ver == 0:
            # legacy unversioned layout: its files sit at the table root
            for f in glob.glob(os.path.join(cur_dir, "*")):
                if os.path.isfile(f):
                    os.remove(f)
        self._sweep_stale_versions(spark, name)

    def compact_table(
        self, spark: SparkSession, name: str, target_file_mb: int = 128
    ) -> int:
        """Coalesce a table's small files toward target_file_mb per file
        (streaming appends produce one file per microbatch; at scale this is
        the standard maintenance op — Iceberg's rewrite_data_files).
        Returns the new file count."""
        import glob

        p = self.path(name)
        if os.path.exists(self._bucket_meta_path(name)):
            # bucketed tables are written one-file-per-bucket; coalescing
            # would destroy the bucket layout — nothing to compact. Count the
            # CURRENT snapshot only (a retained previous snapshot is not data)
            return len(
                glob.glob(os.path.join(self.current_data_dir(name), "*.parquet"))
            )
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

    def drop(self, name: str, spark: SparkSession | None = None) -> None:
        meta = self._bucket_meta(name)
        if meta is not None and spark is not None:
            spark.sql(
                f"DROP TABLE IF EXISTS {self._table_ident(name, meta.get('version', 0))}"
            )
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)
        bm = self._bucket_meta_path(name)
        if os.path.exists(bm):
            os.remove(bm)

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

        # bucketed tables: current snapshot only (retained previous snapshots
        # would double-count); plain/sharded tables: the whole tree
        root = (
            self.current_data_dir(table)
            if os.path.exists(self._bucket_meta_path(table))
            else self.path(table)
        )
        files = sorted(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))
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

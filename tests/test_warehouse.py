"""Warehouse MERGE-emulation semantics (reference upsert identity: per-label
uniqueness constraints, app/graph/schema_setup.py:18-28; MERGE templates
app/graph/queries.py:9-114): new rows win on key collision, re-runs are
idempotent, non-colliding rows survive."""

from __future__ import annotations

from medical_doc_knowledge_graph_system_spark.sources.warehouse import Warehouse


def _ident(wh: Warehouse, name: str) -> str:
    """Catalog identity of the CURRENT snapshot of a bucketed table."""
    return wh._table_ident(name, wh._bucket_meta(name).get("version", 0))


def test_merge_upsert_new_wins(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    df1 = spark.createDataFrame(
        [("a", 1), ("b", 1)], "node_key string, version int"
    )
    wh.merge_upsert(df1, "t", ["node_key"])
    df2 = spark.createDataFrame(
        [("b", 2), ("c", 2)], "node_key string, version int"
    )
    wh.merge_upsert(df2, "t", ["node_key"])
    got = {r.node_key: r.version for r in wh.read(spark, "t").collect()}
    assert got == {"a": 1, "b": 2, "c": 2}


def test_merge_upsert_idempotent(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 1)], "k string, v int")
    wh.merge_upsert(df, "t", ["k"])
    wh.merge_upsert(df, "t", ["k"])
    rows = wh.read(spark, "t").collect()
    assert len(rows) == 2  # dedup on key + idempotent re-run


def test_checkpoint_roundtrip(tmp_path):
    wh = Warehouse(str(tmp_path))
    assert not wh.checkpoint_done("stage1")
    wh.mark_checkpoint("stage1", "complete", rows=10, wall_ms=5.0)
    assert wh.checkpoint_done("stage1")
    wh.mark_checkpoint("stage1", "failed", rows=0, wall_ms=1.0)
    assert not wh.checkpoint_done("stage1")  # latest record wins


def test_compact_table(spark, tmp_path):
    from medical_doc_knowledge_graph_system_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path))
    df = spark.range(10000).selectExpr("id", "id * 2 as v")
    df.repartition(20).write.parquet(wh.path("t"))
    import glob, os

    before = len(glob.glob(os.path.join(wh.path("t"), "*.parquet")))
    assert before >= 20
    wh.compact_table(spark, "t")
    after = len(glob.glob(os.path.join(wh.path("t"), "*.parquet")))
    assert after < before
    assert wh.read(spark, "t").count() == 10000


def test_bucketed_write_read_reregister(spark, tmp_path):
    """Bucketed tables (Iceberg bucket(N, url) analogue): roundtrip, catalog
    re-registration after a 'restart' (catalog entry gone, files + persisted
    bucket spec remain), and drop() cleaning the spec."""
    import os

    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame(
        [(f"u{i % 20}", i) for i in range(100)], "url string, v int"
    )
    wh.write_bucketed(df, "t", n_buckets=4)
    assert wh.read(spark, "t").count() == 100
    # one file per bucket (what makes scans report sorted hash partitioning),
    # inside the current snapshot's version dir
    import glob

    files = glob.glob(os.path.join(wh.current_data_dir("t"), "*.parquet"))
    assert len(files) == 4

    # simulate a fresh session: catalog entry dropped, files + meta survive
    spark.sql(f"DROP TABLE {_ident(wh, 't')}")
    got = wh.read(spark, "t")
    assert got.count() == 100
    assert got.where("url = 'u3'").count() == 5
    # re-registered table carries the bucket spec (a plain filter scan shows
    # Bucketed: false by design — autoBucketedScan skips it when no operator
    # needs the partitioning; the join plan test covers the beneficial case)
    desc = spark.sql(f"DESCRIBE EXTENDED {_ident(wh, 't')}").collect()
    desc_map = {r.col_name: r.data_type for r in desc}
    assert desc_map.get("Num Buckets") == "4"
    assert "url" in desc_map.get("Bucket Columns", "")

    wh.drop("t")
    assert not os.path.exists(wh._bucket_meta_path("t"))


def test_merge_upsert_preserves_bucketing(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    df1 = spark.createDataFrame([("u1", 1), ("u2", 1)], "url string, v int")
    wh.write_bucketed(df1, "t", n_buckets=2)
    df2 = spark.createDataFrame([("u2", 2), ("u3", 2)], "url string, v int")
    wh.merge_upsert(df2, "t", ["url"])
    got = {r.url: r.v for r in wh.read(spark, "t").collect()}
    assert got == {"u1": 1, "u2": 2, "u3": 2}
    import os

    assert os.path.exists(wh._bucket_meta_path("t"))
    desc = {r.col_name: r.data_type for r in spark.sql(
        f"DESCRIBE EXTENDED {_ident(wh, 't')}").collect()}
    assert desc.get("Num Buckets") == "2"
    # compaction is a no-op on bucketed layout (1 file per bucket already)
    assert wh.compact_table(spark, "t") == 2


def test_bucketed_merge_touches_only_hit_buckets(spark, tmp_path):
    """Bucket-targeted MERGE (VERDICT r2 #2): upserting rows that hash into
    a subset of buckets must leave every other bucket file BYTE-IDENTICAL
    (only O(touched/N) of the table is rewritten), while merge semantics
    (new wins, non-colliding survive) and the bucket layout are preserved."""
    import glob
    import hashlib
    import os

    from pyspark.sql import functions as F

    wh = Warehouse(str(tmp_path))
    df1 = spark.createDataFrame(
        [(f"url-{i}", 1) for i in range(64)], "url string, v int"
    )
    wh.write_bucketed(df1, "t", n_buckets=8)

    def file_digests():
        return {
            os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
            for f in glob.glob(os.path.join(wh.current_data_dir("t"), "*.parquet"))
        }

    before = file_digests()
    assert len(before) == 8

    # update 2 urls + insert 1 — compute which buckets those rows hash into
    upd = spark.createDataFrame(
        [("url-3", 2), ("url-17", 2), ("url-new", 2)], "url string, v int"
    )
    touched = {
        r.b for r in upd.select(F.pmod(F.hash("url"), F.lit(8)).alias("b")).collect()
    }
    wh.merge_upsert(upd, "t", ["url"])

    after = file_digests()
    touched_before = {
        f for f in before if Warehouse._bucket_id_of_file(f) in touched
    }
    # untouched bucket files byte-identical (same name, same digest)
    for f in set(before) - touched_before:
        assert after[f] == before[f], f"untouched bucket file rewritten: {f}"
    # touched buckets were rewritten (old file names gone)
    assert not (touched_before & set(after))

    got = {r.url: r.v for r in wh.read(spark, "t").collect()}
    assert got["url-3"] == 2 and got["url-17"] == 2 and got["url-new"] == 2
    assert got["url-5"] == 1 and len(got) == 65
    # layout intact: still exactly one file per bucket, catalog still bucketed
    assert len(after) == 8
    desc = {r.col_name: r.data_type for r in spark.sql(
        f"DESCRIBE EXTENDED {_ident(wh, 't')}").collect()}
    assert desc.get("Num Buckets") == "8"
    # merged bucket files keep the within-bucket sort (file-skipping contract)
    for f in glob.glob(os.path.join(wh.current_data_dir("t"), "*.parquet")):
        urls = [r.url for r in spark.read.parquet(f).collect()]
        assert urls == sorted(urls)
    # the merge committed a NEW snapshot; the previous one is RETAINED for
    # in-flight readers / time travel (hardlinked, so it costs only the
    # touched buckets' old files) and reads back as the pre-merge table
    assert wh._bucket_meta("t")["version"] == 2
    old = {r.url: r.v for r in wh.read_bucketed(spark, "t", version=1).collect()}
    assert old == {f"url-{i}": 1 for i in range(64)}
    # a second merge rolls the retention window: v1 is swept, v2 retained
    wh.merge_upsert(
        spark.createDataFrame([("url-0", 3)], "url string, v int"), "t", ["url"]
    )
    assert not os.path.exists(os.path.join(wh.path("t"), "v1"))
    assert os.path.exists(os.path.join(wh.path("t"), "v2"))
    import pytest

    with pytest.raises(FileNotFoundError):
        wh.read_bucketed(spark, "t", version=1)


def test_bucketed_merge_composite_keys(spark, tmp_path):
    """Bucket-targeted merge with composite keys (url, chunk_id) — the
    chunks-table shape: bucket col in keys localizes the buckets, the
    secondary key distinguishes rows within a url."""
    wh = Warehouse(str(tmp_path))
    df1 = spark.createDataFrame(
        [(f"u{i % 4}", f"c{i}", 1) for i in range(16)],
        "url string, chunk_id string, v int",
    )
    wh.write_bucketed(df1, "t", n_buckets=4)
    upd = spark.createDataFrame(
        [("u1", "c1", 2), ("u1", "c99", 2)], "url string, chunk_id string, v int"
    )
    wh.merge_upsert(upd, "t", ["url", "chunk_id"])
    got = {(r.url, r.chunk_id): r.v for r in wh.read(spark, "t").collect()}
    assert got[("u1", "c1")] == 2 and got[("u1", "c99")] == 2
    assert got[("u1", "c5")] == 1 and got[("u0", "c0")] == 1
    assert len(got) == 17


def test_plain_write_retires_bucket_spec(spark, tmp_path):
    """Overwriting a bucketed table with a plain write must retire the bucket
    spec + catalog entry — otherwise later reads scan plain files under a
    CLUSTERED BY claim the files no longer honor."""
    import os

    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v int")
    wh.write_bucketed(df, "t", n_buckets=2)
    assert os.path.exists(wh._bucket_meta_path("t"))
    ident = _ident(wh, "t")
    wh.write(df, "t")  # plain overwrite (e.g. re-run with bucket_by_url=0)
    assert not os.path.exists(wh._bucket_meta_path("t"))
    assert not spark.catalog.tableExists(ident)
    assert wh.read(spark, "t").count() == 2


def test_bucketed_write_crash_leaves_snapshot_intact(spark, tmp_path):
    """Snapshot atomicity: a write that fails mid-materialization must leave
    the previous snapshot committed and readable (the bucket-spec pointer
    never flips), and the next successful write sweeps the orphan dir."""
    import os

    import pytest
    from pyspark.sql import functions as F

    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v int")
    wh.write_bucketed(df, "t", n_buckets=2)
    assert wh._bucket_meta("t")["version"] == 1

    bad = df.withColumn(
        "v", F.when(F.assert_true(F.col("v") < 0).isNull(), F.col("v"))
    )
    with pytest.raises(Exception):
        wh.write_bucketed(bad, "t", n_buckets=2)
    # pointer never flipped; previous snapshot fully readable
    assert wh._bucket_meta("t")["version"] == 1
    assert {r.url: r.v for r in wh.read(spark, "t").collect()} == {"u1": 1, "u2": 2}

    wh.write_bucketed(df.withColumn("v", F.col("v") + 10), "t", n_buckets=2)
    assert wh._bucket_meta("t")["version"] == 2
    assert {r.url: r.v for r in wh.read(spark, "t").collect()} == {"u1": 11, "u2": 12}
    # v1 retained (previous snapshot); the failed write's orphan never became
    # a version at all
    assert os.path.exists(os.path.join(wh.path("t"), "v1"))
    wh.write_bucketed(df, "t", n_buckets=2)  # roll the window
    assert not os.path.exists(os.path.join(wh.path("t"), "v1"))


def test_append_to_bucketed_table_raises(spark, tmp_path):
    """write(mode='append') on a snapshot-versioned bucketed table must
    refuse (ADVICE r3): plain root-level appends would strand the existing
    rows inside v<N>/ dirs the root-level read never sees."""
    import pytest

    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([("u1", 1)], "url string, v int")
    wh.write_bucketed(df, "t", n_buckets=2)
    with pytest.raises(ValueError, match="bucketed table"):
        wh.write(df, "t", mode="append")
    # table intact, bucket layout untouched
    assert {r.url: r.v for r in wh.read(spark, "t").collect()} == {"u1": 1}
    # overwrite remains the documented retire-the-layout path
    wh.write(df.withColumn("v", df.v + 1), "t", mode="overwrite")
    assert {r.url: r.v for r in wh.read(spark, "t").collect()} == {"u1": 2}


def test_read_bucketed_missing_table_raises_filenotfound(spark, tmp_path):
    """read_bucketed on a dropped / never-bucketed table raises an explicit
    FileNotFoundError, not an AttributeError on the absent meta (ADVICE r3)."""
    import pytest

    wh = Warehouse(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="no bucketed table"):
        wh.read_bucketed(spark, "nope")
    df = spark.createDataFrame([("u1", 1)], "url string, v int")
    wh.write_bucketed(df, "t", n_buckets=2)
    wh.drop("t", spark)
    with pytest.raises(FileNotFoundError, match="no bucketed table"):
        wh.read_bucketed(spark, "t")


def test_concurrent_merges_no_torn_snapshot(spark, tmp_path):
    """Two independent writer PROCESSES merging disjoint keys into the same
    bucketed table concurrently (VERDICT r3 #5). The stage+rename-claim
    commit protocol guarantees no torn snapshot: the final pointer must
    reference a complete version dir (_SUCCESS, one file per bucket, every
    file parseable) whose contents are one of the three serializable
    outcomes — base+A, base+B (documented lost-update window,
    last-committer-wins), or base+A+B (one writer observed the other's
    commit). Both version dirs that were claimed must be complete."""
    import glob
    import os
    import subprocess
    import sys
    import time

    import pyarrow.parquet as pq

    wh = Warehouse(str(tmp_path))
    base = spark.createDataFrame(
        [(f"u{i}", 0) for i in range(8)], "url string, v int"
    )
    wh.write_bucketed(base, "t", n_buckets=4)

    worker = os.path.join(os.path.dirname(__file__), "helpers", "concurrent_merge_worker.py")
    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, tag, str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for tag in ("a", "b")
    ]
    deadline = time.time() + 150
    while not all(
        os.path.exists(os.path.join(str(tmp_path), f"ready_{t}")) for t in ("a", "b")
    ):
        if time.time() > deadline or any(p.poll() not in (None,) for p in procs):
            for p in procs:
                p.kill()
                print(p.communicate()[0].decode()[-2000:])
            raise AssertionError("workers failed to reach the barrier")
        time.sleep(0.1)
    with open(os.path.join(str(tmp_path), "go"), "w"):
        pass
    outs = [p.communicate(timeout=150)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    # pointer references a complete snapshot
    cur = wh.current_data_dir("t")
    assert os.path.exists(os.path.join(cur, "_SUCCESS"))
    files = glob.glob(os.path.join(cur, "*.parquet"))
    assert len(files) == 4  # exactly one file per bucket, no interleaving
    for f in files:
        pq.ParquetFile(f)  # parseable, not torn

    got = {r.url: r.v for r in wh.read(spark, "t").collect()}
    base_keys = {f"u{i}" for i in range(8)}
    a_keys = {f"a{i}" for i in range(4)}
    b_keys = {f"b{i}" for i in range(4)}
    assert set(got) in (
        base_keys | a_keys,
        base_keys | b_keys,
        base_keys | a_keys | b_keys,
    ), sorted(got)
    # base rows survive untouched in every outcome
    assert all(got[k] == 0 for k in base_keys)

    # every claimed version dir is complete (a loser's committed-but-
    # superseded snapshot is still a valid snapshot, never a torn one)
    for d in glob.glob(os.path.join(wh.path("t"), "v*")):
        assert os.path.exists(os.path.join(d, "_SUCCESS")), d


def test_read_incremental_returns_only_rewritten_buckets(spark, tmp_path):
    """Iceberg-style snapshot-incremental read (r4): after a merge touching
    a subset of buckets, read_incremental returns exactly the rows of the
    rewritten buckets (hardlinked untouched buckets are excluded by inode
    identity); after the initial write, everything is new."""
    from pyspark.sql import functions as F

    wh = Warehouse(str(tmp_path))
    base = spark.createDataFrame(
        [(f"u{i}", 0) for i in range(16)], "url string, v int"
    )
    wh.write_bucketed(base, "t", n_buckets=4)
    assert wh.read_incremental(spark, "t").count() == 16  # v1: all new

    upd = spark.createDataFrame([("u3", 1), ("u3b", 1)], "url string, v int")
    wh.merge_upsert(upd, "t", ["url"])
    inc = wh.read_incremental(spark, "t")
    got = {r.url: r.v for r in inc.collect()}
    assert "u3" in got and got["u3"] == 1 and got["u3b"] == 1
    # only the touched buckets' rows: every returned row hashes into the
    # bucket set of the incoming keys
    n = 4
    touched = {
        r.b
        for r in upd.select(F.pmod(F.hash("url"), F.lit(n)).alias("b")).collect()
    }
    for r in inc.collect():
        b = spark.createDataFrame([(r.url,)], "url string").select(
            F.pmod(F.hash("url"), F.lit(n)).alias("b")
        ).collect()[0].b
        assert b in touched, (r.url, b, touched)
    # strictly fewer rows than the table unless every bucket was hit
    assert inc.count() < wh.read(spark, "t").count()


def test_merge_schema_mismatch_raises(spark, tmp_path):
    """A merge whose frame carries unexpected or missing columns must fail
    loudly instead of silently dropping data (r4)."""
    import pytest

    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([("u1", 1)], "url string, v int")
    wh.write_bucketed(df, "t", n_buckets=2)
    with pytest.raises(ValueError, match="schema mismatch"):
        wh.merge_upsert(
            spark.createDataFrame([("u2", 2, "x")], "url string, v int, junk string"),
            "t",
            ["url"],
        )
    with pytest.raises(ValueError, match="schema mismatch"):
        wh.merge_upsert(
            spark.createDataFrame([("u2",)], "url string"), "t", ["url"]
        )
    # table untouched by the failed merges
    assert {r.url: r.v for r in wh.read(spark, "t").collect()} == {"u1": 1}


def test_claim_skipped_orphan_not_addressable_and_reaped(spark, tmp_path):
    """A crash orphan occupying a claimed-but-never-committed version
    number (complete with a plausible _SUCCESS) must (a) push the next
    writer to the next free number, (b) never be addressable via time
    travel — only the COMMITTED lineage (version / prev_version) is —
    and (c) be reaped once the retention base moves past it."""
    import os
    import shutil

    import pytest

    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([("u1", 1)], "url string, v int")
    wh.write_bucketed(df, "t", n_buckets=2)  # v1
    # fake a claimed-but-unflipped commit at v2 (crashed writer)
    orphan = os.path.join(wh.path("t"), "v2")
    shutil.copytree(wh.current_data_dir("t"), orphan)
    wh.write_bucketed(df.withColumn("v", df.v + 1), "t", n_buckets=2)
    meta = wh._bucket_meta("t")
    assert meta["version"] == 3 and meta["prev_version"] == 1  # v2 skipped
    # committed lineage addressable; the orphan is not
    assert {r.v for r in wh.read_bucketed(spark, "t", version=1).collect()} == {1}
    assert {r.v for r in wh.read_bucketed(spark, "t").collect()} == {2}
    with pytest.raises(FileNotFoundError, match="committed"):
        wh.read_bucketed(spark, "t", version=2)
    # orphan survives this commit's sweep (concurrent-claim grace band)...
    assert os.path.exists(orphan)
    wh.write_bucketed(df.withColumn("v", df.v + 2), "t", n_buckets=2)  # v4
    # ...and is reaped once the base (prev_version=3) moves past it
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.join(wh.path("t"), "v1"))
    assert {r.v for r in wh.read_bucketed(spark, "t", version=3).collect()} == {2}


def test_read_incremental_manifest_driven_and_orphan_proof(spark, tmp_path):
    """r5: the change feed diffs the COMMITTED file manifests — pure
    metadata, no inode inspection, no version arithmetic — so it is
    portable to object stores AND immune to the ADVICE-r4 scenario: a
    crash orphan occupying v(cur-1) must not perturb the incremental
    read, which still returns exactly the last commit's rewritten
    buckets."""
    import os
    import shutil

    wh = Warehouse(str(tmp_path))
    base = spark.createDataFrame(
        [(f"u{i}", 0) for i in range(16)], "url string, v int"
    )
    wh.write_bucketed(base, "t", n_buckets=4)  # v1
    wh.merge_upsert(
        spark.createDataFrame([("u3", 1)], "url string, v int"), "t", ["url"]
    )  # v2
    # fake a crashed writer's claimed-but-never-committed dir at v3
    orphan = os.path.join(wh.path("t"), "v3")
    shutil.copytree(wh.current_data_dir("t"), orphan)
    wh.merge_upsert(
        spark.createDataFrame([("u5", 2)], "url string, v int"), "t", ["url"]
    )  # claim skips the orphan -> v4, prev_version=2
    meta = wh._bucket_meta("t")
    assert meta["version"] == 4 and meta["prev_version"] == 2
    inc = wh.read_incremental(spark, "t")
    got = {r.url: r.v for r in inc.collect()}
    assert got.get("u5") == 2
    # only u5's bucket came back, NOT the whole table (the pre-r5 inode
    # diff against the orphan dir returned everything here)
    assert inc.count() < wh.read(spark, "t").count()
    # manifest mechanics: carried (hardlinked) files kept their committed
    # ids; at least one rewritten file got a fresh one
    m, pm = meta["manifest"], meta["prev_manifest"]
    assert [b for b in m if pm.get(b) == m[b]], "untouched buckets must carry ids"
    assert [b for b in m if pm.get(b) != m[b]], "merged bucket must get a new id"


def test_read_incremental_legacy_meta_inode_fallback(spark, tmp_path):
    """A meta committed before manifests existed falls back to the inode
    diff — against the COMMITTED prev_version, never cur-1 arithmetic."""
    wh = Warehouse(str(tmp_path))
    base = spark.createDataFrame(
        [(f"u{i}", 0) for i in range(16)], "url string, v int"
    )
    wh.write_bucketed(base, "t", n_buckets=4)  # v1
    wh.merge_upsert(
        spark.createDataFrame([("u3", 1)], "url string, v int"), "t", ["url"]
    )  # v2
    meta = wh._bucket_meta("t")
    for k in ("manifest", "prev_manifest"):
        meta.pop(k, None)
    wh._write_bucket_meta("t", meta)
    inc = wh.read_incremental(spark, "t")
    assert {r.url for r in inc.collect()} >= {"u3"}
    assert inc.count() < wh.read(spark, "t").count()


def test_claim_version_reraises_unexpected_oserror(tmp_path):
    """_claim_version retries only on an occupied target (ENOTEMPTY/EEXIST);
    a vanished stage dir (ENOENT — e.g. reaped as a stale orphan) raises
    instead of looping forever (ADVICE r4)."""
    import os

    import pytest

    wh = Warehouse(str(tmp_path))
    os.makedirs(wh.path("t"), exist_ok=True)
    with pytest.raises(OSError):
        wh._claim_version("t", os.path.join(wh.path("t"), ".stage-gone"), 1)


def test_read_changes_since_multi_commit_catchup(spark, tmp_path):
    """r5 CDC surface: a consumer that slept through several commits reads
    the union of the buckets those commits rewrote, at their CURRENT
    content, from pure committed metadata (changed_log base-chaining).
    Unprovable windows (full rewrite inside, off-chain watermark) degrade
    to the full-table superset; an up-to-date watermark reads nothing."""
    from pyspark.sql import functions as F

    wh = Warehouse(str(tmp_path))
    base = spark.createDataFrame(
        [(f"u{i}", 0) for i in range(16)], "url string, v int"
    )
    wh.write_bucketed(base, "t", n_buckets=4)  # v1 (full)
    mark = wh.current_version("t")
    assert mark == 1
    wh.merge_upsert(
        spark.createDataFrame([("u3", 1)], "url string, v int"), "t", ["url"]
    )  # v2
    wh.merge_upsert(
        spark.createDataFrame([("u5", 2)], "url string, v int"), "t", ["url"]
    )  # v3
    ch = wh.read_changes_since(spark, "t", mark)
    got = {r.url: r.v for r in ch.collect()}
    assert got.get("u3") == 1 and got.get("u5") == 2
    # bucket-exact: every returned row hashes into the touched-bucket union
    n = 4
    touched = {
        r.b
        for r in spark.createDataFrame([("u3",), ("u5",)], "url string")
        .select(F.pmod(F.hash("url"), F.lit(n)).alias("b"))
        .collect()
    }
    for url in got:
        b = (
            spark.createDataFrame([(url,)], "url string")
            .select(F.pmod(F.hash("url"), F.lit(n)).alias("b"))
            .collect()[0]
            .b
        )
        assert b in touched, (url, b, touched)
    assert ch.count() < wh.read(spark, "t").count()
    # up-to-date watermark -> empty frame with the table schema
    cur = wh.current_version("t")
    assert wh.read_changes_since(spark, "t", cur).count() == 0
    # full rewrite inside the window -> full-table read (exact: every
    # bucket really changed)
    wh.write_bucketed(
        base.withColumn("v", F.lit(9)), "t", n_buckets=4
    )  # v4 "full"
    assert (
        wh.read_changes_since(spark, "t", mark).count()
        == wh.read(spark, "t").count()
    )

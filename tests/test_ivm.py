"""Bucket-partial incremental view maintenance (sources/ivm.py): the
maintained aggregate must equal a full recompute after every refresh,
refresh only the changed buckets' partials, catch up across missed
commits, survive a crash between partials and watermark, and degrade to
a full rebuild on unprovable CDC windows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.sources.ivm import BucketAggView
from medical_doc_knowledge_graph_system_spark.sources.warehouse import Warehouse


def _view(wh, state_dir):
    return BucketAggView(
        wh,
        "t",
        partial_fn=lambda df: df.groupBy("__bucket", "label").agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("v").cast("long").alias("s"),
        ),
        merge_fn=lambda p: p.groupBy("label").agg(
            F.sum("c").cast("long").alias("n"),
            F.sum("s").cast("long").alias("sv"),
        ),
        state_dir=state_dir,
    )


def _full(spark, wh):
    return {
        r.label: (r.n, r.sv)
        for r in wh.read(spark, "t")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("sv"),
        )
        .collect()
    }


def _got(df):
    return {r.label: (r.n, r.sv) for r in df.collect()}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "url string, label string, v long")


def test_ivm_full_build_then_incremental_refresh(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    wh.write_bucketed(
        _rows(spark, [(f"u{i}", f"L{i % 3}", i) for i in range(32)]),
        "t",
        n_buckets=4,
    )
    view = _view(wh, str(tmp_path / "view"))
    assert _got(view.refresh(spark)) == _full(spark, wh)
    assert view.watermark() == wh.current_version("t")

    # upsert into a subset of buckets; only those partials may change
    before = {
        d: os.path.getmtime(os.path.join(view.partials_dir, d))
        for d in os.listdir(view.partials_dir)
        if d.startswith("__bucket=")
    }
    wh.merge_upsert(_rows(spark, [("u3", "L9", 100)]), "t", ["url"])
    assert _got(view.refresh(spark)) == _full(spark, wh)
    changed_ids = wh.changed_buckets_since("t", 1)
    assert changed_ids and len(changed_ids) < 4
    for d, mt in before.items():
        b = int(d.split("=")[1])
        now = os.path.getmtime(os.path.join(view.partials_dir, d))
        if b in changed_ids:
            assert now > mt, f"changed bucket {b} partial not refreshed"
        else:
            assert now == mt, f"untouched bucket {b} partial rewritten"


def test_ivm_multi_commit_catchup_and_noop(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    wh.write_bucketed(
        _rows(spark, [(f"u{i}", f"L{i % 2}", 1) for i in range(16)]),
        "t",
        n_buckets=4,
    )
    view = _view(wh, str(tmp_path / "view"))
    view.refresh(spark)
    # two commits between refreshes -> one catch-up covers both
    wh.merge_upsert(_rows(spark, [("u3", "L0", 5)]), "t", ["url"])
    wh.merge_upsert(_rows(spark, [("u5", "L1", 7), ("ux", "L7", 9)]), "t", ["url"])
    assert _got(view.refresh(spark)) == _full(spark, wh)
    # no new commits: refresh is a pure merge, watermark unchanged
    wm = view.watermark()
    assert _got(view.refresh(spark)) == _full(spark, wh)
    assert view.watermark() == wm


def test_ivm_crash_between_partials_and_watermark_is_idempotent(
    spark, tmp_path
):
    wh = Warehouse(str(tmp_path / "wh"))
    wh.write_bucketed(
        _rows(spark, [(f"u{i}", "L", i) for i in range(8)]), "t", n_buckets=2
    )
    view = _view(wh, str(tmp_path / "view"))
    view.refresh(spark)
    wh.merge_upsert(_rows(spark, [("u1", "L", 50)]), "t", ["url"])
    view.refresh(spark)
    # simulate the crash window: partials updated, watermark write lost
    os.remove(view._state_path())
    # replay refreshes from scratch (unprovable None window -> full
    # rebuild) and converges to the same answer
    assert _got(view.refresh(spark)) == _full(spark, wh)


def test_ivm_unprovable_window_full_rebuild(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    wh.write_bucketed(
        _rows(spark, [(f"u{i}", f"L{i % 3}", i) for i in range(12)]),
        "t",
        n_buckets=4,
    )
    view = _view(wh, str(tmp_path / "view"))
    view.refresh(spark)
    # a FULL rewrite commit makes the window unprovable -> full rebuild,
    # including labels that vanished entirely (stale partials dropped)
    wh.write_bucketed(
        _rows(spark, [(f"w{i}", "M", i) for i in range(6)]), "t", n_buckets=4
    )
    got = _got(view.refresh(spark))
    assert got == _full(spark, wh)
    assert set(got) == {"M"}

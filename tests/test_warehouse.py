"""Warehouse MERGE-emulation semantics (reference upsert identity: per-label
uniqueness constraints, app/graph/schema_setup.py:18-28; MERGE templates
app/graph/queries.py:9-114): new rows win on key collision, re-runs are
idempotent, non-colliding rows survive."""

from __future__ import annotations

from medical_doc_knowledge_graph_system_spark.sources.warehouse import Warehouse


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

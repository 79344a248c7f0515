"""`crawlpages` Python DataSource (Spark 4 DataSource API): batch read
byte-identity vs the seeded generator, partition planning, streaming
incremental drain, and checkpointed restart exactly-once."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.datagen import page_row
from medical_doc_knowledge_graph_system_spark.sources import crawl_source


def _batch(spark, n, **opts):
    crawl_source.register(spark)
    r = spark.read.format("crawlpages").option("n", n)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_byte_identical_to_generator(spark):
    df = _batch(spark, 100, partitions=4)
    rows = {r.url: (r.text, r.html, r.lang, r.warc_ts) for r in df.collect()}
    assert len(rows) == 100
    for i in range(100):
        ref = page_row(i)
        assert rows[ref["url"]] == (
            ref["text"],
            bytearray(ref["html"]) if ref["html"] is not None else None,
            ref["lang"],
            ref["warc_ts"],
        )


def test_batch_partition_planning(spark):
    df = _batch(spark, 100, partitions=7)
    assert df.rdd.getNumPartitions() == 7
    # uneven split still covers every index exactly once
    assert df.count() == 100
    assert df.select("url").distinct().count() == 100


def test_batch_read_is_deterministic(spark):
    a = sorted(r.url + "|" + (r.text or "") for r in _batch(spark, 50).collect())
    b = sorted(r.url + "|" + (r.text or "") for r in _batch(spark, 50).collect())
    assert a == b


def test_stream_drains_in_multiple_batches_and_matches_batch(spark):
    crawl_source.register(spark)
    st = (
        spark.readStream.format("crawlpages")
        .option("n", 96)
        .option("batch_rows", 32)
        .load()
    )
    q = (
        st.writeStream.format("memory")
        .queryName("crawl_drain")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("crawl_drain").count() >= 96:
                break
            time.sleep(0.5)
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    out = spark.table("crawl_drain")
    assert out.count() == 96
    assert n_batches >= 2  # genuinely incremental, not one mega-batch
    batch_urls = sorted(r.url for r in _batch(spark, 96).collect())
    assert sorted(r.url for r in out.collect()) == batch_urls


def test_stream_restart_from_checkpoint_exactly_once(spark, tmp_path):
    crawl_source.register(spark)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        st = (
            spark.readStream.format("crawlpages")
            .option("n", 96)
            .option("batch_rows", 32)
            .load()
        )
        return (
            st.selectExpr("url", "lang")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if [p for p in q.recentProgress if p["numInputRows"] > 0]:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    q2 = start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 96:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == 96  # no duplicates across the restart
    assert got.select("url").distinct().count() == 96


def test_gate_query_matches_generator_values(spark):
    import __spark_entry__ as entry

    df = entry.queries()["source_crawl"](spark, "/root/testdata/sf0.001")
    got = {r.url: (r.wts, r.lang, r.text_md5, r.text_len) for r in df.collect()}
    import hashlib

    for i in range(64):
        ref = page_row(i, 42)
        t = ref["text"] or ""
        assert got[ref["url"]] == (
            ref["warc_ts"].strftime("%Y-%m-%d %H:%M:%S"),
            ref["lang"],
            hashlib.md5(t.encode()).hexdigest(),
            len(t),
        )

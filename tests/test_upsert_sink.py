"""Streaming MERGE sink (streaming/incremental.py::upsert_sink): drained
stream == batch upsert; batch-id fence makes same-batch replay a no-op and
blocks the out-of-order-replay clobber merge_upsert alone would allow."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from medical_doc_knowledge_graph_system_spark.sources.warehouse import Warehouse
from medical_doc_knowledge_graph_system_spark.streaming.incremental import (
    upsert_sink,
)


def _rows_of(df):
    return sorted((r.url, r.v) for r in df.collect())


def test_upsert_sink_stream_equals_batch_and_fences_replays(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    src = str(tmp_path / "src")
    # two microbatch files with an overlapping key: u1 appears in both, the
    # later batch's value must win
    b0 = spark.createDataFrame([("u0", 0), ("u1", 10)], "url string, v int")
    b1 = spark.createDataFrame([("u1", 11), ("u2", 2)], "url string, v int")
    b0.repartition(1).write.mode("overwrite").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    # pin file order so u1=11 is genuinely the LATER batch
    files = sorted(
        (os.path.getmtime(f.path), f.path)
        for f in os.scandir(src)
        if f.name.endswith(".parquet")
    )
    for i, (_, p) in enumerate(files):
        os.utime(p, (1e9 + i, 1e9 + i))

    sink = upsert_sink(wh, "t", ["url"])
    q = (
        spark.readStream.schema("url string, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows_of(wh.read(spark, "t")) == [("u0", 0), ("u1", 11), ("u2", 2)]

    # same-batch replay (at-least-once redelivery): must be a no-op
    sink(b1, 1)
    assert _rows_of(wh.read(spark, "t")) == [("u0", 0), ("u1", 11), ("u2", 2)]
    # OUT-OF-ORDER replay of the older epoch with the stale u1=10: without
    # the fence merge_upsert would clobber the newer u1=11
    sink(b0, 0)
    assert _rows_of(wh.read(spark, "t")) == [("u0", 0), ("u1", 11), ("u2", 2)]
    # a genuinely new epoch still applies
    sink(spark.createDataFrame([("u2", 22)], "url string, v int"), 2)
    assert _rows_of(wh.read(spark, "t")) == [("u0", 0), ("u1", 11), ("u2", 22)]

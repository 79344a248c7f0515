"""Custom stateful streaming operator: cross-batch exactly-once chunk dedup
via applyInPandasWithState.

Incremental crawls re-deliver pages (snapshot overlap, re-crawls). This
operator keys the stream by url-hash shard and keeps per-shard state of
seen chunk_ids, emitting only first-seen chunks — the streaming analogue of
the MERGE-by-chunk_id upsert (reference A5 semantics,
app/graph/queries.py:18-31) with bounded per-key state.

Sharding by url-hash (not by chunk_id) keeps the state-store key count
fixed (N_SHARDS) while state size tracks distinct chunks; at web scale,
state would instead hold a TTL'd bloom/recent-window per shard — noted in
the docstring because exact dedup state is unbounded by nature.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_SHARDS = 32

OUT_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()), True)])


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf[~pdf["chunk_id"].isin(seen)].drop_duplicates("chunk_id")
        if len(fresh):
            seen.update(fresh["chunk_id"].tolist())
            yield fresh[["chunk_id", "url", "chunk_idx", "text"]]
    state.update((sorted(seen),))


def dedup_chunk_stream(chunk_stream: DataFrame) -> DataFrame:
    """Streaming chunks -> first-seen-only chunks with per-shard state."""
    keyed = chunk_stream.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)).cast("int")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

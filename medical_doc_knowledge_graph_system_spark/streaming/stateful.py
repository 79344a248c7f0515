"""Custom stateful streaming operator: cross-batch exactly-once chunk dedup
via applyInPandasWithState, with BOUNDED per-shard state.

Incremental crawls re-deliver pages (snapshot overlap, re-crawls). This
operator keys the stream by url-hash shard and keeps per-shard state of
recently seen chunk ids, emitting only first-seen chunks — the streaming
analogue of the MERGE-by-chunk_id upsert (reference A5 semantics,
app/graph/queries.py:18-31).

State is bounded two ways (exact dedup state is unbounded by nature, so a
web-scale stream needs a window contract):
  * entries are 16-hex-char (64-bit) prefixes of the md5 chunk_id, not the
    full id — half the bytes, collision odds ~n^2/2^65 (≈3e-10 at the
    default window) and a collision only suppresses a duplicate-looking
    chunk, the conservative direction for dedup;
  * each shard keeps at most `max_state_entries` ids in insertion order and
    evicts the OLDEST on overflow (recent-window semantics): re-deliveries
    within the window — the snapshot-overlap case, which in a crawl arrives
    within hours — are suppressed exactly; a re-delivery older than the
    window is re-emitted and compacted later by the batch MERGE, the same
    contract Kafka-connect-style dedup buffers document.

Sharding by url-hash (not by chunk_id) keeps the state-store KEY count fixed
(n_shards) while the window bounds the per-key state size, so total state is
<= n_shards * max_state_entries * 16 bytes regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_SHARDS = 32
MAX_STATE_ENTRIES = 100_000
_PREFIX_LEN = 16

OUT_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()), True)])


def _make_dedup_fn(max_state_entries: int):
    def _dedup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # `order` preserves insertion (recency) order for eviction; `seen` is
        # the O(1) membership set over the same entries
        order: list[str] = list(state.get[0]) if state.exists else []
        seen: set[str] = set(order)
        for pdf in pdfs:
            prefixes = pdf["chunk_id"].str.slice(0, _PREFIX_LEN)
            # membership AND intra-batch dedup both key on the PREFIX (the
            # unit the state stores): two distinct ids sharing a prefix in
            # one microbatch emit once, exactly as if they arrived in
            # separate batches (ADVICE r3 — emission matches the
            # prefix-keyed state contract)
            fresh = pdf.loc[~prefixes.isin(seen) & ~prefixes.duplicated()]
            if len(fresh):
                for p in prefixes.loc[fresh.index]:
                    seen.add(p)
                    order.append(p)
                yield fresh[["chunk_id", "url", "chunk_idx", "text"]]
            if len(order) > max_state_entries:
                # evict oldest beyond the window EAGERLY (state never exceeds
                # the bound past one input batch); evicted prefixes leave
                # `seen` too, so a same-batch re-delivery of an evicted chunk
                # re-emits — identical to the cross-batch window semantics
                evicted = order[: len(order) - max_state_entries]
                order = order[-max_state_entries:]
                seen.difference_update(evicted)
        state.update((order,))

    return _dedup_fn


def dedup_chunk_stream_native(
    chunk_stream: DataFrame, ts_col: str = "ts", delay: str = "1 hour"
) -> DataFrame:
    """Spark's built-in stateful dedup: watermark + dropDuplicatesWithinWatermark
    keyed on chunk_id. The engine owns the state store and EXPIRES keys once
    the watermark passes them + `delay` — the same bounded-state contract the
    custom operator above implements by hand (recent-window eviction), with
    the bound expressed in event time instead of entry count. Re-deliveries
    inside the watermark window dedup exactly; older ones re-emit and
    compact in the batch MERGE. Prefer this when the stream has a real
    event-time column; the custom operator remains for id-only streams and
    for the per-shard state-size knob."""
    return chunk_stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["chunk_id"]
    )


def dedup_chunk_stream(
    chunk_stream: DataFrame,
    n_shards: int = N_SHARDS,
    max_state_entries: int = MAX_STATE_ENTRIES,
) -> DataFrame:
    """Streaming chunks -> first-seen-only chunks with bounded per-shard state."""
    keyed = chunk_stream.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_dedup_fn(max_state_entries),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct-count sketch: the batch sketch from
# functions/sketches.py::kmv_distinct as a stateful streaming operator.
# Per-group state is the k smallest 48-bit hashes plus a processed-row
# counter — FIXED SIZE forever, the property that makes a distinct-count
# over an unbounded stream possible at all. The KMV merge rule (union,
# keep k smallest) is associative and commutative, so the cross-batch
# fold here equals the batch sketch on the drained prefix exactly —
# which is what the gate oracle checks. The emitted n_rows is strictly
# increasing per touched key, giving the drain a deterministic
# latest-row selector under update-mode sinks.

KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n_min", T.LongType(), False),
        T.StructField("h_k", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.LongType()), True),
        T.StructField("n_rows", T.LongType(), True),
    ]
)


def _make_kmv_fn(k: int):
    def _kmv_fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, n_rows = state.get
            hset = set(hs)
        else:
            hset, n_rows = set(), 0
        for pdf in pdfs:
            n_rows += len(pdf)
            hset.update(int(h) for h in pdf["h"])
            if len(hset) > 4 * k:  # opportunistic trim, same merge rule
                hset = set(sorted(hset)[:k])
        merged = sorted(hset)[:k]
        state.update((merged, n_rows))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_min": [len(merged)],
                "h_k": [merged[-1]],
                "n_rows": [n_rows],
            }
        )

    return _kmv_fn


def kmv_stream(
    events_stream: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 32,
) -> DataFrame:
    """Streaming KMV sketch per `group_col` over `value_col`: emits
    (event_type, n_min, h_k, n_rows) every batch the group is touched.
    The 48-bit md5 hash is computed JVM-side before the stateful op (the
    same `sketches._h48` convention, bit-identical to the batch gate);
    state per key is <= k longs + one counter. At true scale the keyed
    shuffle is per group — for few heavy groups, shard the key
    (group, hash % n) and merge shard sketches downstream; the KMV merge
    rule makes that a plain re-fold."""
    from ..functions.sketches import _h48

    hashed = events_stream.select(
        F.col(group_col).alias("event_type"), _h48(F.col(value_col)).alias("h")
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        _make_kmv_fn(k),
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming HyperLogLog: the batch sketch from functions/sketches.py::
# hll_distinct as a stateful streaming operator. Per-group state is the
# 64-long register array + a processed-row counter — fixed ~0.5 KB forever.
# Register merge is element-wise MAX (associative, commutative, idempotent
# — HLL's defining property), so the cross-batch fold equals the batch
# sketch on the drained prefix exactly; the gate computes the estimate
# from the emitted registers with the IDENTICAL closed-form expression the
# batch operator uses, and shares the events_hll DuckDB oracle verbatim.

HLL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("regs", T.ArrayType(T.LongType()), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)

HLL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.ArrayType(T.LongType()), True),
        T.StructField("n_rows", T.LongType(), True),
    ]
)


def _hll_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        regs, n_rows = state.get
        regs = list(regs)
    else:
        regs, n_rows = [0] * 64, 0
    for pdf in pdfs:
        n_rows += len(pdf)
        for reg, mx in pdf.groupby("reg")["rank"].max().items():
            r = int(reg)
            regs[r] = max(regs[r], int(mx))
    state.update((regs, n_rows))
    yield pd.DataFrame(
        {"event_type": [key[0]], "regs": [regs], "n_rows": [n_rows]}
    )


def hll_stream(events_stream: DataFrame, value_col) -> DataFrame:
    """Streaming HLL sketch per event_type over `value_col` (a column or
    name): register/rank are computed JVM-side before the stateful op via
    the same `sketches._hll_reg_rank` used by the batch gate, so the
    folded registers are bit-identical to the batch sketch."""
    from ..functions.sketches import _hll_reg_rank

    value = value_col if isinstance(value_col, F.Column) else F.col(value_col)
    reg, rank = _hll_reg_rank(value)
    keyed = events_stream.select(
        F.col("event_type"), reg.alias("reg"), rank.alias("rank")
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _hll_fn,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class LatestEventProcessor:
    """transformWithState processor (the Spark 4 arbitrary-state API that
    supersedes applyInPandasWithState): per-(user, event_type) running
    LATEST event under the (ts, event_id) total order.

    ENVIRONMENT-GATED: transformWithStateInPandas talks to the JVM state
    server over protobuf, so it needs the `protobuf` Python package at
    runtime — absent in this container (the driver worker crashes with
    `ImportError: google.protobuf` in StateMessage_pb2; verified
    r5 twelfth session). The operator is complete and covered by a
    protobuf-gated test; the driver gates keep the
    applyInPandasWithState sketches (stream_hll/stream_kmv), which carry
    no such dependency. If protobuf appears, add a `stream_tws_latest`
    gate sharing the events_latest oracle verbatim (the drained fold is
    the same monotone max-struct).

    State = ONE ValueState row (ts, event_id, value) — the same monotone
    order-prefixed-struct max the batch `events_latest` gate computes, so
    every update emission only ever tightens toward the batch answer and
    the drained per-key fold equals the batch max exactly. handleInputRows
    folds each Arrow batch vectorized (one idxmax per batch, no per-row
    Python), merges with the stored row, updates, and emits the current
    running latest.

    Deliberately timer-free (timeMode="none"): the op is a pure running
    aggregate; eviction/TTL belongs to the engine's state store config at
    deployment, not the operator.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "latest", "ts timestamp_ntz, event_id long, value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        best = None
        if self._state.exists():
            t = self._state.get()
            best = (t[0], t[1], t[2])
        for pdf in rows:
            if len(pdf) == 0:
                continue
            i = pdf.sort_values(["ts", "event_id"]).index[-1]
            cand = (
                pdf["ts"][i].to_pydatetime(),
                int(pdf["event_id"][i]),
                float(pdf["value"][i]),
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        self._state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "ts": [best[0]],
                "event_id": [best[1]],
                "value": [best[2]],
            }
        )

    def close(self) -> None:
        pass


def latest_event_stream(events_stream: DataFrame) -> DataFrame:
    """Running latest event per (user_id, event_type) via
    transformWithStateInPandas; update-mode emissions, drained fold ==
    batch events_latest."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so importing this module never requires the
    # transformWithState API (pyspark >= 4.0 only)
    proc = type(
        "_LatestProc", (LatestEventProcessor, StatefulProcessor), {}
    )()
    return events_stream.groupBy("user_id", "event_type").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=(
            "user_id long, event_type string, ts timestamp_ntz,"
            " event_id long, value double"
        ),
        outputMode="Update",
        timeMode="None",
    )

"""Arrow-batched per-group custom logic: the `groupBy().applyInPandas`
and `cogroup().applyInPandas` surfaces — the escape hatch for per-group
semantics Catalyst can't express, kept honest by emitting ONLY exact
integers (so results are bit-identical to the SQL oracle and invariant to
partitioning / Arrow batch boundaries).

Scale shape: both ops shuffle ONCE on a deterministic hash BUCKET of the
group key (guide §4.5: per-call overhead amortized — a million tiny user
groups would otherwise mean a million pandas-frame constructions; a few
hundred buckets mean a few hundred, with the per-key logic vectorized in
NumPy inside the bucket). Per-task state is bounded by the largest bucket
(= table_rows / n_buckets for a hash bucket, plus the largest single key),
and results are invariant to the bucketing because every key's rows land
in exactly one bucket and the kernels below are per-key exact.

No per-row Python UDFs anywhere (invariant #5): these are Arrow-vectorized
group transforms, the sanctioned slow path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# buckets for the grouped-pandas shuffle: enough for full reduce-side
# parallelism on any node size we run, few enough that the per-call pandas
# overhead stays amortized (rows/bucket >> 1)
GROUPED_BUCKETS = 256


def _bucket(key: str, n: int = GROUPED_BUCKETS):
    return F.pmod(F.xxhash64(key), F.lit(n)).cast("int")


def ecdf_ranks(df: DataFrame, key: str, order: list[str]) -> DataFrame:
    """(key, last-of-order id, rnk, n) per row: the per-key empirical-CDF
    rank (1-based position under `order`, which must be a unique total
    order within each key) and the key's row count — the normalization
    every per-user feature scaler needs, as a grouped pandas transform.

    Semantically identical to ROW_NUMBER() + COUNT() OVER (PARTITION BY
    key) — the point of the op is exercising the applyInPandas contract
    against that exact SQL oracle. Outputs are pure BIGINTs; the per-key
    logic runs vectorized over a hash bucket of keys (sort + groupby
    cumcount), so emissions are independent of bucketing and batching.
    """
    id_col = order[-1]
    out_schema = f"{key} long, {id_col} long, rnk long, n long"

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key, *order], kind="mergesort")
        g = pdf.groupby(key, sort=False)
        return pd.DataFrame(
            {
                key: pdf[key].values,
                id_col: pdf[id_col].values,
                "rnk": (g.cumcount() + 1).values,
                "n": g[key].transform("size").values,
            }
        )

    return (
        df.select(key, *order)
        .withColumn("__bkt", _bucket(key))
        .groupBy("__bkt")
        .applyInPandas(lambda pdf: per_bucket(pdf.drop(columns="__bkt")), out_schema)
    )


def views_before_purchase(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    view_type: str = "view",
    purchase_type: str = "purchase",
) -> DataFrame:
    """(key, event_id, n_views_before) for every purchase event: how many
    of the key's view events STRICTLY precede it — last-touch attribution's
    counting kernel, as a two-sided `cogroup().applyInPandas` merge.

    Exact BIGINT counts. Both sides cogroup on the same hash bucket of the
    key; inside a bucket the per-key counts come from one lexicographic
    searchsorted over (key-index, timestamp-rank) — integer arithmetic, so
    the result is identical to the per-key merge whatever the bucketing.
    """
    views = events.where(F.col("event_type") == view_type).select(key, ts_col)
    # the purchase side's timestamp gets a FRESH attribute (alias => new
    # exprId): both cogroup sides derive from the same relation, and
    # Spark's self-join attribute dedup otherwise rewrites the right
    # side's ts to the LEFT side's — column pruning then drops it from
    # the right child and the UDF receives a purchase frame without ts
    # (reproduced under .count(); .collect() planned differently)
    purch = events.where(F.col("event_type") == purchase_type).select(
        F.col(key).alias(key),
        F.col("event_id").alias("event_id"),
        F.col(ts_col).alias("__p_ts"),
    )
    out_schema = f"{key} long, event_id long, n_views_before long"

    def per_bucket(vg: pd.DataFrame, pg: pd.DataFrame) -> pd.DataFrame:
        if len(pg) == 0:
            # dtypes must be explicit: a bare empty DataFrame defaults to
            # float64 and Arrow would reject the long schema
            return pd.DataFrame(
                {
                    key: pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "n_views_before": pd.Series(dtype="int64"),
                }
            )
        pu = pg[key].values.astype(np.int64)
        if len(vg) == 0:
            # an empty cogroup side can arrive as a COLUMN-LESS frame
            # (depends on Arrow batch layout) — never index into it
            nvb = np.zeros(len(pg), dtype=np.int64)
        else:
            vu = vg[key].values.astype(np.int64)
            vt = vg[ts_col].values
            pt = pg["__p_ts"].values
            # compress keys and timestamps to dense ranks so the combined
            # (key, ts) order key stays inside int64 for any id magnitude
            uu = np.unique(np.concatenate([vu, pu]))
            ut = np.unique(np.concatenate([vt, pt]))
            m = np.int64(len(ut) + 1)
            vk = np.searchsorted(uu, vu).astype(np.int64) * m + np.searchsorted(ut, vt)
            vk.sort()
            pk_user = np.searchsorted(uu, pu).astype(np.int64) * m
            tgt = pk_user + np.searchsorted(ut, pt)
            # strictly-before count = rows of the user below (user, p_ts)
            nvb = np.searchsorted(vk, tgt, side="left") - np.searchsorted(
                vk, pk_user, side="left"
            )
        return pd.DataFrame(
            {
                key: pg[key].values,
                "event_id": pg["event_id"].values,
                "n_views_before": nvb.astype(np.int64),
            }
        )

    return (
        views.withColumn("__bkt", _bucket(key))
        .groupBy("__bkt")
        .cogroup(purch.withColumn("__bkt", _bucket(key)).groupBy("__bkt"))
        .applyInPandas(
            lambda vg, pg: per_bucket(
                vg.drop(columns="__bkt", errors="ignore"),
                pg.drop(columns="__bkt", errors="ignore"),
            ),
            out_schema,
        )
    )

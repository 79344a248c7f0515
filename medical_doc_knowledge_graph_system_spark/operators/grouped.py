"""Arrow-batched per-group custom logic: the `groupBy().applyInPandas`
and `cogroup().applyInPandas` surfaces — the escape hatch for per-group
semantics Catalyst can't express, kept honest by emitting ONLY exact
integers (so results are bit-identical to the SQL oracle and invariant to
partitioning / Arrow batch boundaries).

Scale shape: both ops shuffle ONCE on the group key and then hold only one
group's rows in memory at a time (Spark streams groups through the Python
worker in Arrow batches); per-group state is bounded by the largest single
key, never by the partition or the table. That is the applyInPandas
contract — these two functions double as the template the multimodal and
extraction UDFs follow.

No per-row Python UDFs anywhere (invariant #5): these are Arrow-vectorized
group transforms, the sanctioned slow path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ecdf_ranks(df: DataFrame, key: str, order: list[str]) -> DataFrame:
    """(key, last-of-order id, rnk, n) per row: the per-key empirical-CDF
    rank (1-based position under `order`, which must be a unique total
    order within each key) and the key's row count — the normalization
    every per-user feature scaler needs, as a grouped pandas transform.

    Semantically identical to ROW_NUMBER() + COUNT() OVER (PARTITION BY
    key) — the point of the op is exercising the applyInPandas contract
    against that exact SQL oracle. Outputs are pure BIGINTs.
    """
    id_col = order[-1]
    out_schema = f"{key} long, {id_col} long, rnk long, n long"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        return pd.DataFrame(
            {
                key: pdf[key].values,
                id_col: pdf[id_col].values,
                "rnk": range(1, len(pdf) + 1),
                "n": len(pdf),
            }
        )

    return df.select(key, *order).groupBy(key).applyInPandas(per_group, out_schema)


def views_before_purchase(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    view_type: str = "view",
    purchase_type: str = "purchase",
) -> DataFrame:
    """(key, event_id, n_views_before) for every purchase event: how many
    of the key's view events STRICTLY precede it — last-touch attribution's
    counting kernel, as a two-sided `cogroup().applyInPandas` merge (sorted
    view timestamps + searchsorted per purchase, O(|views| log) per key
    instead of the oracle's per-key view×purchase inequality join).

    Exact BIGINT counts; per-key state = that key's views + purchases only.
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

    def per_key(vg: pd.DataFrame, pg: pd.DataFrame) -> pd.DataFrame:
        if pg.empty:
            # dtypes must be explicit: a bare empty DataFrame defaults to
            # float64 and Arrow would reject the long schema
            return pd.DataFrame(
                {
                    key: pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "n_views_before": pd.Series(dtype="int64"),
                }
            )
        if len(vg) == 0:
            # an empty cogroup side can arrive as a COLUMN-LESS frame
            # (depends on Arrow batch layout) — never index into it
            nvb = pd.Series(0, index=range(len(pg)), dtype="int64").values
        else:
            vts = vg[ts_col].sort_values().values
            nvb = vts.searchsorted(pg["__p_ts"].values, side="left")
        return pd.DataFrame(
            {
                key: pg[key].values,
                "event_id": pg["event_id"].values,
                "n_views_before": nvb,
            }
        )

    return (
        views.groupBy(key)
        .cogroup(purch.groupBy(key))
        .applyInPandas(per_key, out_schema)
    )

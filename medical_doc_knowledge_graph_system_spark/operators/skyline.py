"""Exact 2-D skyline (Pareto frontier) over a DataFrame.

A point p is DOMINATED iff some q is ≥ p on both dimensions and > p on at
least one; the skyline is the undominated set. Reference-class analog:
Börzsönyi et al., "The Skyline Operator" (ICDE 2001) — the BNL/SFS
algorithms there are single-node; this is the distributed re-expression.

Why this shape scales: the naive definition is an O(n²) anti-join, but in
2-D the skyline is exactly

  { p : y(p) = max y among x-group(p)  AND  y(p) > max y over all x > x(p) }

so it reduces to (1) one hash aggregation to per-x group maxima — the only
pass over the full data — then (2) a suffix-max over the DISTINCT-x frame
in descending x, computed with the same two-phase bucketed prefix pattern
as corpusstats.vocab_growth (per-range-bucket window in parallel + one
|buckets|-row carry window — never a global single-partition sort of the
data), then (3) a broadcast join of the surviving (x, y) pairs back onto
the input. Ties on both dims all survive together (no arbitrary pick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d_max(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_width: int = 256,
) -> DataFrame:
    """Rows of `df` on the maximize-both Pareto frontier of (x_col, y_col).

    Both columns must be integral (exact comparisons are what make the
    cross-engine semantics trivial). Returns the input rows unchanged.
    """
    w = int(bucket_width)
    # pinned: the suffix-max window AND the bucket-carry aggregate both
    # consume this frame — unpinned, Catalyst re-runs the full group-max
    # pass per branch (zero cross-branch reuse, the repo-wide gotcha)
    gm = (
        df.groupBy(x_col)
        .agg(F.max(y_col).alias("__gy"))
        .withColumn("__bkt", (F.col(x_col) - (F.col(x_col) % w)))
        .localCheckpoint(eager=True)
    )
    # per-bucket suffix max over strictly-greater x (x distinct within gm)
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = gm.withColumn("__lm", F.max("__gy").over(w_local))
    # carry: max group-y over all strictly HIGHER buckets (|buckets| rows)
    w_carry = (
        Window.orderBy(F.desc("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        gm.groupBy("__bkt")
        .agg(F.max("__gy").alias("__bmax"))
        .select("__bkt", F.max("__bmax").over(w_carry).alias("__carry"))
    )
    sky = (
        local.join(F.broadcast(carry), "__bkt")
        .withColumn("__sup", F.greatest(F.col("__lm"), F.col("__carry")))
        .where(F.col("__sup").isNull() | (F.col("__gy") > F.col("__sup")))
        .select(F.col(x_col).alias("__sx"), F.col("__gy"))
    )
    return df.join(
        F.broadcast(sky),
        (df[x_col] == F.col("__sx")) & (df[y_col] == F.col("__gy")),
    ).drop("__sx", "__gy")

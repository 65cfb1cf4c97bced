"""2-D skyline (Pareto frontier) operator.

A row survives iff no other row is >= on BOTH axes with at least one strict
inequality (both axes maximized). Skyline is distributive —
skyline(S) = skyline(union of per-bucket skylines) — so the distributed plan
buckets the x axis, prunes against later-bucket maxima, and only then runs
the in-bucket frontier: no stage ever holds more than one bucket's
candidates, and the only full-table pass is a map-side-combinable per-bucket
max. See queries/cdc.py::skyline_orders for the oracle-checked instance;
tests/test_properties.py pins equivalence with the brute-force O(n^2)
definition on random inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (x, y) Pareto frontier, both axes maximized.

    ``bucket`` is a monotone-in-x coarsening expression (default: x itself —
    correct always, cheapest when x has few distinct values; pass e.g.
    ``F.date_trunc("day", x)`` for timestamp axes so the threshold frame
    stays |buckets|-sized)."""
    # NULL coordinates are excluded up front: domination is undefined for
    # NULL, and the bucketed joins below would silently drop NULL-x rows
    # while a NOT EXISTS oracle keeps them — define the semantics instead
    # of inheriting a divergence.
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    b = bucket if bucket is not None else F.col(x_col)
    per_bucket = df.groupBy(b.alias("_skb")).agg(F.max(y_col).alias("_bmax"))
    w_later = Window.orderBy(F.col("_skb").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thresh = per_bucket.select(
        "_skb", F.max("_bmax").over(w_later).alias("_mlater")
    )
    cand = df.join(F.broadcast(thresh), b == F.col("_skb"), "left").filter(
        F.col("_mlater").isNull() | (F.col(y_col) > F.col("_mlater"))
    )
    # in-bucket frontier among candidates (every dominator of a candidate is
    # itself a candidate): y must equal the max at its exact x and exceed
    # the max over strictly greater x in the same bucket. The x-distinct
    # pre-aggregate keeps the window deterministic under x ties.
    x_max = cand.groupBy("_skb", F.col(x_col).alias("_skx")).agg(
        F.max(y_col).alias("_xmax")
    )
    w_bucket = Window.partitionBy("_skb").orderBy(F.col("_skx").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    x_thresh = x_max.select(
        F.col("_skb").alias("_tb"),
        "_skx",
        "_xmax",
        F.max("_xmax").over(w_bucket).alias("_mlater_x"),
    )
    return (
        cand.join(
            x_thresh,
            (F.col("_skb") == F.col("_tb")) & (F.col(x_col) == F.col("_skx")),
        )
        .filter(
            (F.col(y_col) == F.col("_xmax"))
            & (F.col("_mlater_x").isNull() | (F.col(y_col) > F.col("_mlater_x")))
        )
        .select(*df.columns)
    )

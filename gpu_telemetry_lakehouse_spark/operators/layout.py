"""Physical layout: Z-order (Morton) clustering for multi-column skipping.

A 1-D sort gives tight per-file min/max ranges on ONE column; predicates on
any other column read every file. Z-ordering interleaves the bits of several
columns so that files cover compact hyper-rectangles — per-file footer stats
stay narrow on EVERY participating column, and tablog's log-level skipping
(or parquet row-group pruning) then works for predicates on any of them.
This is Delta's OPTIMIZE ZORDER BY re-expressed as pure Catalyst column
expressions: normalize each key to a fixed-bit rank, interleave bits with
shift/and/or (whole-stage-codegen-friendly — no UDF), range-partition by the
resulting Morton code, and sort within partitions.

At 100 TB the cost is one range-partitioned shuffle (same as any global
sort); the payoff is multiplicative scan reduction on every clustered
dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: list[Column | str],
    ranges: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton code of ``cols`` as a LONG column.

    Each column is min/max-normalized into ``bits`` levels using the caller-
    supplied value ranges (at scale these come from table stats — exactness
    does not matter, only monotonicity; out-of-range values clamp to the
    edge bucket). Bit b of column i lands at position b*len(cols)+i.
    ``bits * len(cols)`` must stay < 63.
    """
    n = len(cols)
    assert n >= 1 and bits * n < 63, "morton code must fit a signed long"
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, (c, (lo, hi)) in enumerate(zip(cols, ranges)):
        c = F.col(c) if isinstance(c, str) else c
        span = float(hi - lo) or 1.0
        norm = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                ((c.cast("double") - float(lo)) * top / span).cast("long"),
            ),
        )
        for b in range(bits):
            bit = F.shiftright(norm, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def cluster_zorder(
    df: DataFrame,
    cols: list[str],
    ranges: list[tuple[float, float]],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` re-clustered on the Morton code of ``cols``: one range
    shuffle + in-partition sort, ready for a stats-collecting write (each
    output file covers a compact region of the key space on every column)."""
    z = zorder_value(cols, ranges, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )

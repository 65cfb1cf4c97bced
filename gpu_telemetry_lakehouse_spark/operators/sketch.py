"""Sketch operators: bounded-memory summaries with an exact refine phase.

The pattern for holistic statistics at 100 TB: a map-side sketch bounds what
each task keeps in memory and what crosses the shuffle; a second, exact pass
runs only over the sketch's (small) candidate set, so the final answer is
EXACT — the approximation only risks extra candidates, never a wrong result.
That is what keeps these entries inside the DuckDB differential gate instead
of a weaker tolerance check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-items sketch: ≤ k counters per
    task, emitted as candidate keys.

    Guarantee (mergeable-summaries form): a key whose count in partition p
    exceeds n_p/(k+1) survives p's sketch. Any global key with count > n/k
    must exceed n_p/k > n_p/(k+1) in at least one partition (pigeonhole), so
    the union of partition candidates is a SUPERSET of the true heavy
    hitters — the exact recount pass can only discard, never miss.

    Memory per task is O(k); shuffle payload is ≤ k keys per partition —
    independent of data volume, which is the point at 100 TB.
    """
    field = df.schema[key_col]

    def sketch(it):
        counters = pd.Series(dtype="int64")
        for pdf in it:
            vc = pdf[key_col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                # subtract the (k+1)-th largest counter from all (batched
                # MG decrement, Agarwal et al. "Mergeable Summaries")
                d = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > d] - d
        yield pd.DataFrame({key_col: counters.index.to_series(index=None)})

    return df.select(key_col).mapInPandas(
        sketch, T.StructType([T.StructField(key_col, field.dataType)])
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact keys with count > n/k, computed sketch-first: MG candidates per
    partition, then an exact recount restricted to the (broadcast-small)
    candidate set. Two scans of the input, but no full-width groupBy shuffle:
    the only exchange moves candidate keys and their partial counts."""
    total = df.count()
    cands = misra_gries_candidates(df, key_col, k).distinct()
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total / k)
    )

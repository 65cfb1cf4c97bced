"""Co-grouped pandas operators (``groupBy().cogroup().applyInPandas``).

The escape hatch for per-key algorithms that need BOTH sides of a join
materialized together but don't fit a SQL join shape — here, the canonical
as-of enrichment: each left row picks up the latest right row at or before
its timestamp (``pandas.merge_asof`` per key group).

Scale shape: ONE co-partitioning shuffle on the key for each side (exactly a
shuffle join's cost), then Arrow-batched pandas per key group — state is one
group, not the whole partition, so skewed keys are the only hazard (salt or
pre-filter hot keys as with any grouped op). Compare queries/joins.py's
``asof_last_error``, which re-plans a self-as-of as a pure window — the
cogroup form is for when the two sides are different tables and the per-key
logic outgrows SQL (interpolation, best-match scoring, model application).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def asof_enrich(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """For every left row: the greatest ``right_ts`` of the same key with
    ``right_ts <= left_ts`` (NULL when none). Output schema = left's columns
    + ``out_col`` timestamp."""
    import pandas as pd

    out_fields = left.schema.fields
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
    schema += f", `{out_col}` timestamp"
    left_cols = [f.name for f in out_fields]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=left_cols + [out_col])
        l = l_pdf.sort_values(left_ts, kind="mergesort")
        r = (
            r_pdf[[right_ts]]
            .dropna()
            .sort_values(right_ts, kind="mergesort")
            .rename(columns={right_ts: out_col})
        )
        merged = pd.merge_asof(
            l, r, left_on=left_ts, right_on=out_col, direction="backward"
        )
        return merged[left_cols + [out_col]]

    return (
        left.groupBy(left_key)
        .cogroup(right.groupBy(right_key))
        .applyInPandas(merge, schema=schema)
    )

"""Batch twin of the streaming hourly rollup (same transform function) —
proves the windowed aggregation semantics against the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..streaming.pipeline import hourly_agg
from .registry import query


@query(
    "events_hourly_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n,
           (SUM(CAST(ROUND(value * 1000000) AS BIGINT)) / 1000000.0) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_agg(load_table(spark, sf_dir, "events"))

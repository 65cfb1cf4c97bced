"""Batch twin of the streaming hourly rollup (same transform function) —
proves the windowed aggregation semantics against the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.pipeline import hourly_agg
from .registry import query


@query(
    "events_hourly_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n,
           (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_agg(load_table(spark, sf_dir, "events"))


# Sliding windows: each event lands in length/slide = 2 buckets, so the
# oracle unnests the two window starts the event belongs to.
@query(
    "events_sliding_window",
    oracle="""
    WITH w AS (
        SELECT unnest([
                   CAST(date_trunc('hour', ts) AS TIMESTAMP),
                   CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP)
               ]) AS win_start,
               event_type, value
        FROM events
    )
    SELECT win_start, event_type,
           COUNT(*) AS n,
           (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0) AS sum_value
    FROM w
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import sliding_value_rate

    return sliding_value_rate(load_table(spark, sf_dir, "events"))


# Stream-static enrichment's batch twin: broadcast dimension join + rollup.
@query(
    "events_enriched_segment_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS hour_start,
           c.c_mktsegment,
           COUNT(*) AS n
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def events_enriched_segment_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import enriched_segment_hourly

    return enriched_segment_hourly(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


# Stream-stream interval join's batch twin: clicks in the 30 minutes before
# each error by the same user. Same transform fn both modes
# (tests/test_streaming.py pins stream==batch; this entry pins batch==oracle).
@query(
    "clicks_before_errors_batch",
    oracle="""
    SELECT e.user_id,
           e.event_id AS error_id,
           e.ts AS error_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events e
    JOIN events c
      ON c.user_id = e.user_id
     AND c.ts <= e.ts
     AND c.ts >= e.ts - INTERVAL 30 MINUTE
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
)
def clicks_before_errors_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import clicks_before_errors

    ev = load_table(spark, sf_dir, "events")
    return clicks_before_errors(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
    )

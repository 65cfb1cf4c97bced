"""Streaming telemetry pipeline: file-source replay -> watermarked windowed
aggregation -> incremental gold; foreachBatch alerting.

reference: README.md:574-584 names exactly this as future work ("replay
script that pushes events into Kafka…", "alerting"). Spark-first: the SAME
transform function serves batch and stream (queries/stream_batch.py calls
``hourly_agg`` on a batch frame; here it runs incrementally with late-data
handling via watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

# events table schema with ts already converted to TimestampType
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_agg(df: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type — shared batch/stream transform.

    Decimal-staged sum keeps the double deterministic (and oracle-matched in
    the batch twin).
    """
    return (
        df.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 1_000_000, 0).cast("long")) / 1e6).alias("sum_value"),
        )
        .select(F.col("win.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of telemetry parquet (the Kafka stand-in; swap
    ``format('kafka')`` in production — the downstream plan is identical)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def incremental_hourly_gold(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked incremental hourly rollup (late rows beyond the watermark
    are dropped deterministically; state is bounded for infinite streams)."""
    return hourly_agg(stream.withWatermark("ts", watermark))


def run_to_memory(
    agg: DataFrame, spark: SparkSession, name: str = "hourly_gold"
) -> tuple[StreamingQuery, DataFrame]:
    """Drive a bounded replay to completion into an in-memory sink (tests /
    local verification; production uses a parquet/Delta sink + checkpoint)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q, agg.sparkSession.table(name)


def session_agg(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (inactivity gap): the streaming twin of the
    batch gaps-and-islands query ``session_windows_users``. Works on both
    batch and streaming frames; streaming requires a watermark upstream.

    session_window merges rows closer than ``gap``; its ``start`` equals the
    batch twin's MIN(ts) per island, so the two agree on
    (user_id, session_start, n_events)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("win.start").alias("session_start"), "n_events"
        )
    )


def incremental_sessions(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return session_agg(stream.withWatermark("ts", watermark))


def alert_on_bursts(
    stream: DataFrame, threshold: int, sink: list, spark: SparkSession
) -> StreamingQuery:
    """foreachBatch alerting (reference: README.md:580-584): any hourly bucket
    whose event count exceeds ``threshold`` is appended to ``sink``."""
    agg = incremental_hourly_gold(stream)

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        hot = batch_df.filter(F.col("n") > threshold).collect()
        sink.extend((epoch_id, r.hour_start, r.event_type, r.n) for r in hot)

    return agg.writeStream.outputMode("complete").foreachBatch(emit).start()

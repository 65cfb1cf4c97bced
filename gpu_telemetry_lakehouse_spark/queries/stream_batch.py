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


# --- REAL streaming execution under the external oracle -------------------------
# Every other entry in this module is a batch TWIN of a streaming plan; this
# one runs the actual micro-batch machinery: the telemetry_replay connector
# streamed (one tick per epoch) through the additive foreachBatch maintenance
# loop into a tablog table with batch-id-idempotent MERGEs, then the table is
# read back. The connector's rows are pure integer-hash functions of
# (machine, tick), so DuckDB can replay the SAME feed with generate_series —
# the hash match certifies streaming execution end-to-end (offsets, epochs,
# exactly-once MERGE folding), not a twin of it.


@query(
    "streaming_gold_probe",
    oracle="""
    WITH g AS (
        SELECT m, t, ((m * 2654435761 + t * 40503) % 2147483648) AS h
        FROM generate_series(0, 5) s1(m), generate_series(0, 4) s2(t)
    )
    SELECT make_timestamp(CAST(1704067200 + t * 60 AS BIGINT) * 1000000)
               AS mn,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(h % 1000) AS BIGINT) AS sum_gpu_tenths
    FROM g GROUP BY 1 ORDER BY mn
    """,
)
def streaming_gold_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a real 5-epoch stream (telemetry_replay, one tick per micro-batch)
    maintaining a per-minute gold table via batch-id-guarded tablog MERGEs;
    return the maintained table. Each epoch folds ADDITIVE partials
    (count, exact gpu tenths) into the keyed row, so arithmetic is integer-
    exact regardless of epoch boundaries, and a replayed epoch is a ledger
    no-op. The oracle regenerates the connector's deterministic feed with
    generate_series and aggregates directly — certifying the streaming
    run's RESULT, not a look-alike batch plan. Cost note: ~15s wall,
    SF-independent — micro-batch machinery + 6 tablog commits, the
    streaming sibling of medallion_end_to_end's full-pipeline cost; it
    buys the only external check of offsets/epochs/exactly-once folding."""
    import os
    import shutil
    from hashlib import md5
    from pathlib import Path

    from .. import tablog as TL
    from ..streaming import replay_source as R

    repo_root = Path(__file__).resolve().parents[2]
    scratch = str(
        repo_root
        / ".scratch"
        / "streaming_gold"
        / md5(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(scratch, ignore_errors=True)
    tbl = os.path.join(scratch, "gold_minutely")
    ck = os.path.join(scratch, "ck")
    R.register(spark)
    opts = {"machines": "6", "ticks": "5"}

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.date_trunc("minute", "ts").alias("mn")).agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.round(F.col("gpu_util") * 10).cast("long")).alias(
                "sum_gpu_tenths"
            ),
        )

    def apply_batch(bdf: DataFrame, epoch_id: int) -> None:
        # Probe-scale fold: full-outer against the WHOLE minute-keyed base
        # each epoch (the gold table is minutes-sized here). At production
        # scale the equivalent is tablog.merge_upsert_pruned — the epoch
        # partial merges into only the files whose stats can contain its
        # keys, cost ∝ change, not table.
        base = TL.read(bdf.sparkSession, tbl)
        upd = (
            partial(bdf)
            .alias("u")
            .join(base.alias("b"), "mn", "full_outer")
            .select(
                "mn",
                (
                    F.coalesce(F.col("u.n_samples"), F.lit(0))
                    + F.coalesce(F.col("b.n_samples"), F.lit(0))
                ).alias("n_samples"),
                (
                    F.coalesce(F.col("u.sum_gpu_tenths"), F.lit(0))
                    + F.coalesce(F.col("b.sum_gpu_tenths"), F.lit(0))
                ).alias("sum_gpu_tenths"),
            )
        )
        TL.merge_upsert(
            bdf.sparkSession, upd, tbl, key_cols=["mn"], batch_id=int(epoch_id)
        )

    empty = partial(
        spark.read.format("telemetry_replay").options(**opts).load()
    ).limit(0)
    TL.create_table(empty, tbl)
    q = (
        spark.readStream.format("telemetry_replay")
        .options(**opts)
        .load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        TL.read(spark, tbl)
        .select(
            "mn",
            F.col("n_samples").cast("long").alias("n_samples"),
            F.col("sum_gpu_tenths").cast("long").alias("sum_gpu_tenths"),
        )
        .orderBy("mn")
    )

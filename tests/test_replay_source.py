"""Custom Python DataSource (telemetry_replay): batch/stream parity,
partitioned generation, deterministic regeneration (retry-safety)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.streaming.replay_source import (
    register,
    row_for,
)

MACHINES, TICKS = 6, 20


def _load(spark):
    register(spark)
    return (
        spark.read.format("telemetry_replay")
        .option("machines", MACHINES)
        .option("ticks", TICKS)
        .option("numPartitions", 3)
        .load()
    )


def test_batch_matches_generator_and_partitions(spark):
    df = _load(spark)
    assert df.rdd.getNumPartitions() == 3
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(row_for(m, t) for m in range(MACHINES) for t in range(TICKS))
    assert got == want


def test_batch_is_deterministic_across_reads(spark):
    a = sorted(tuple(r) for r in _load(spark).collect())
    b = sorted(tuple(r) for r in _load(spark).collect())
    assert a == b


def test_stream_equals_batch(spark):
    register(spark)
    stream = (
        spark.readStream.format("telemetry_replay")
        .option("machines", MACHINES)
        .option("ticks", TICKS)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_replay")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.table("t_replay").collect())
    finally:
        q.stop()
    want = sorted(tuple(r) for r in _load(spark).collect())
    assert got == want


def test_stream_aggregates_like_engine_gold(spark):
    """The connector feeds the same incremental gold rollup as file replay:
    per-machine averages over the simulated hour match the batch compute."""
    register(spark)
    stream = (
        spark.readStream.format("telemetry_replay")
        .option("machines", MACHINES)
        .option("ticks", TICKS)
        .load()
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("machine_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("gpu_util").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_replay_gold")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.machine_id: (r.n, round(r.s, 6))
            for r in spark.table("t_replay_gold").collect()
        }
    finally:
        q.stop()
    want = {
        r.machine_id: (r.n, round(r.s, 6))
        for r in _load(spark)
        .groupBy("machine_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("gpu_util").alias("s"))
        .collect()
    }
    assert got == want

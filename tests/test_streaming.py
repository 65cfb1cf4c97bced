"""Streaming replay == batch result; watermark + foreachBatch alerting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
    alert_on_bursts,
    hourly_agg,
    incremental_hourly_gold,
    read_event_stream,
    run_to_memory,
)


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir, tmp_path_factory):
    """Events split into several files so maxFilesPerTrigger yields real
    multi-batch incremental execution."""
    d = str(tmp_path_factory.mktemp("replay"))
    ev = load_table(spark, sf_dir, "events")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(d)
    return d


def test_stream_equals_batch(spark, sf_dir, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    q, result = run_to_memory(incremental_hourly_gold(stream), spark, name="t_hourly")
    try:
        got = {
            (r.hour_start, r.event_type): (r.n, r.sum_value) for r in result.collect()
        }
    finally:
        q.stop()
    batch = hourly_agg(load_table(spark, sf_dir, "events"))
    want = {
        (r.hour_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == want  # incremental == batch, bit-for-bit


def test_burst_alerts(spark, replay_dir):
    alerts: list = []
    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    q = alert_on_bursts(stream, threshold=2, sink=alerts, spark=spark)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert alerts, "expected at least one hourly bucket above threshold"
    assert all(n > 2 for (_, _, _, n) in alerts)

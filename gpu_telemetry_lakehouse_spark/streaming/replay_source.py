"""Custom Python DataSource: a deterministic telemetry-feed generator.

The reference names "a replay script that pushes events into Kafka ... to
mimic real-time telemetry" as future work (reference README.md:574-578).
Spark 4's Python DataSource API lets that feed be a first-class connector
instead of a side script: ``spark.read.format("telemetry_replay")`` for a
bounded backfill, ``spark.readStream`` for the live simulation — the SAME
generator serves both, so stream==batch differential tests extend to the
connector itself.

Scale design: the batch reader splits the machine-id range into
``numPartitions`` input partitions — generation is embarrassingly parallel
and each task materializes only its slice (constant memory, no driver
fan-in). Values are pure hash functions of (machine_id, tick), so any
partitioning of the work yields identical data — which is also what makes
the source exactly-once under task retries: a re-executed partition
regenerates bit-identical rows. The stream reader tracks one integer offset
(the tick counter); ``readBetweenOffsets`` replays any window
deterministically for recovery.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "machine_id INT, tick INT, ts TIMESTAMP, gpu_util DOUBLE, "
    "cpu_util DOUBLE, net_recv DOUBLE"
)
_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
_STEP_S = 60


def row_for(machine_id: int, tick: int) -> tuple:
    """The deterministic generator shared by batch, stream, and tests:
    everything derives from integer hashes of (machine_id, tick)."""
    import datetime as dt

    h = (machine_id * 2654435761 + tick * 40503) % 2**31
    ts = dt.datetime.fromtimestamp(
        _BASE_EPOCH + tick * _STEP_S, tz=dt.timezone.utc
    ).replace(tzinfo=None)
    return (
        machine_id,
        tick,
        ts,
        round((h % 1000) / 10.0, 1),          # gpu_util 0..99.9
        round(((h // 1000) % 1000) / 10.0, 1),  # cpu_util
        float(h % 100_000),                    # net_recv
    )


class _MachineSlice(InputPartition):
    def __init__(self, lo: int, hi: int, ticks: int):
        self.lo, self.hi, self.ticks = lo, hi, ticks


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_machines = int(options.get("machines", 8))
        self.ticks = int(options.get("ticks", 60))
        self.n_parts = int(options.get("numPartitions", 4))

    def partitions(self):
        per = -(-self.n_machines // self.n_parts)  # ceil
        return [
            _MachineSlice(lo, min(lo + per, self.n_machines), self.ticks)
            for lo in range(0, self.n_machines, per)
        ]

    def read(self, part: _MachineSlice):
        for m in range(part.lo, part.hi):
            for t in range(part.ticks):
                yield row_for(m, t)


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    """One tick per micro-batch across ALL machines; the offset is the tick
    counter, so checkpoint recovery replays exactly the missed ticks."""

    def __init__(self, options):
        self.n_machines = int(options.get("machines", 8))
        self.max_ticks = int(options.get("ticks", 60))

    def initialOffset(self):
        return {"tick": 0}

    def read(self, start: dict):
        t = start["tick"]
        if t >= self.max_ticks:  # bounded simulation: feed is drained
            return iter(()), start
        rows = [row_for(m, t) for m in range(self.n_machines)]
        return iter(rows), {"tick": t + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for t in range(start["tick"], end["tick"]):
            for m in range(self.n_machines):
                yield row_for(m, t)


class TelemetryReplaySource(DataSource):
    @classmethod
    def name(cls):
        return "telemetry_replay"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _ReplayBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _ReplayStreamReader(self.options)


def register(spark) -> None:
    import sys

    from pyspark import cloudpickle

    from ..session import _ship_package

    # DataSource classes normally unpickle by module REFERENCE, so the
    # worker (including the driver-side planning runner, which ignores
    # runtime-added pyFiles) must import this module by name — which fails
    # under an external driver with a neutral cwd. Two belts: ship the
    # package zip for task workers, and register this module for BY-VALUE
    # cloudpickle so the planning runner needs no import at all (the module
    # depends only on pyspark + stdlib, so by-value is self-contained).
    _ship_package(spark)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(TelemetryReplaySource)

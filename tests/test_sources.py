"""Round-trip fidelity of the edge formats (ORC, JSON-lines, CSV): every
value — microsecond timestamps, doubles, nested-JSON strings — must survive
write+read bit-for-bit against the parquet original."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.sources import read_table, write_table
from gpu_telemetry_lakehouse_spark.streaming.pipeline import EVENTS_STREAM_SCHEMA


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["orc", "json", "csv", "xml"])
def test_events_roundtrip(spark, sf_dir, tmp_path, fmt):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / fmt)
    write_table(ev, path, fmt)
    back = read_table(spark, path, EVENTS_STREAM_SCHEMA, fmt)
    assert back.schema == ev.select(*EVENTS_STREAM_SCHEMA.fieldNames()).schema
    assert _rows(back) == _rows(ev)


def test_orc_pushdown_prunes(spark, sf_dir, tmp_path):
    """ORC must give the same scan-level guarantees as parquet: pushed
    filters and a pruned read schema."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "orc")
    write_table(ev, path, "orc")
    back = read_table(spark, path, EVENTS_STREAM_SCHEMA, "orc")
    plan = (
        back.filter(F.col("event_type") == "error")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "event_type" in plan.split("PushedFilters")[1]


def test_csv_quarantine_ingest(spark, tmp_path):
    """Malformed CSV rows are quarantined with their raw text, clean rows
    ingest under the declared schema — nothing dropped silently."""
    from pyspark.sql import types as T

    from gpu_telemetry_lakehouse_spark.ingest import ingest_csv_quarantine

    src = tmp_path / "jobs.csv"
    src.write_text(
        "job,started,cpu\n"
        "a,100,1.5\n"
        "b,not_a_number,2.0\n"   # started fails LongType
        "c,300,oops\n"           # cpu fails DoubleType
        "d,400,4.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("job", T.StringType()),
            T.StructField("started", T.LongType()),
            T.StructField("cpu", T.DoubleType()),
        ]
    )
    clean, bad = ingest_csv_quarantine(spark, str(src), schema, str(tmp_path / "out"))
    assert {r.job for r in clean.collect()} == {"a", "d"}
    raw = [r._corrupt_record for r in bad.collect()]
    assert len(raw) == 2 and any("not_a_number" in r for r in raw)

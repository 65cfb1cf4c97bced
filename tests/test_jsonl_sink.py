"""Custom sink commit protocol: manifest-gated visibility, batch + stream."""

from __future__ import annotations

import json
import os

from gpu_telemetry_lakehouse_spark.jsonl_sink import read_committed, register
from gpu_telemetry_lakehouse_spark.streaming.replay_source import (
    register as register_source,
)


def test_batch_write_commits_manifest(spark, tmp_path):
    register(spark)
    register_source(spark)
    df = (
        spark.read.format("telemetry_replay")
        .option("machines", 4)
        .option("ticks", 10)
        .option("numPartitions", 3)
        .load()
    )
    out = str(tmp_path / "sink")
    df.write.format("jsonl_manifest").option("path", out).mode("append").save()

    files = os.listdir(out)
    manifests = [f for f in files if f.startswith("_manifest-")]
    parts = [f for f in files if f.startswith("part-")]
    assert len(manifests) == 1
    listed = json.load(open(os.path.join(out, manifests[0])))["files"]
    assert sorted(listed) == sorted(parts)

    rows = read_committed(out)
    assert len(rows) == 40
    want = {(r.machine_id, r.tick) for r in df.collect()}
    assert {(r["machine_id"], r["tick"]) for r in rows} == want

    # an orphan file (failed attempt) stays invisible
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write(json.dumps({"machine_id": 999, "tick": 0}) + "\n")
    assert len(read_committed(out)) == 40


def test_stream_write_one_manifest_per_epoch(spark, tmp_path):
    register(spark)
    register_source(spark)
    stream = (
        spark.readStream.format("telemetry_replay")
        .option("machines", 3)
        .option("ticks", 8)
        .load()
    )
    out = str(tmp_path / "sink")
    q = (
        stream.writeStream.format("jsonl_manifest")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    manifests = [f for f in os.listdir(out) if f.startswith("_manifest-")]
    assert len(manifests) >= 2, "expected multiple epochs"
    rows = read_committed(out)
    assert len(rows) == 3 * 8
    assert {(r["machine_id"], r["tick"]) for r in rows} == {
        (m, t) for m in range(3) for t in range(8)
    }

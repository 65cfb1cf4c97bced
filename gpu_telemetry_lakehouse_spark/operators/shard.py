"""Deterministic training-shard export.

The last mile of a 100 TB corpus pipeline: materialize the curated corpus as
N fixed shards that (a) assign every record by a STABLE engine-portable hash
(md5-derived, not Spark's internal murmur — so shard membership is
reproducible across engines, versions, and reruns), (b) are internally
sorted for deterministic iteration order, and (c) ship with a manifest of
per-shard row counts and order-independent XOR checksums computed from a
READ-BACK of the written files — the manifest certifies what is on disk, not
what the plan intended.

Scale: one hash repartition (the only shuffle), in-partition sort (no global
sort), one output file per shard directory via partitioned write, and a
single verification scan. Shard count is the training-job parallelism knob;
at 100 TB you pick n_shards so each shard is a few GB.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import md5_int

MANIFEST_NAME = "_manifest.json"


def shard_of(key_col, n_shards: int):
    """Stable shard id: md5-derived 60-bit int mod n_shards (portable to any
    engine; DuckDB twin in queries/pipeline_ops.py::shard_manifest_summary)."""
    return F.pmod(md5_int(F.col(key_col).cast("string")), F.lit(n_shards)).cast("int")


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    sort_cols: list[str] | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` hash-assigned, internally-sorted parquet
    shards under ``path`` plus a read-back-verified manifest. Returns the
    manifest dict: {"n_shards", "total_rows", "shards": {sid: {"rows",
    "xor_checksum"}}}."""
    spark = df.sparkSession
    sharded = df.withColumn("_shard", shard_of(key, n_shards))
    (
        sharded.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", *(sort_cols or [key]))
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(path)
    )
    # Manifest from what landed on disk — the certification a training job
    # checks before consuming (row counts + order-free XOR of the key hash).
    back = spark.read.parquet(path)
    rows = (
        back.groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(md5_int(F.col(key).cast("string"))).alias("xor_checksum"),
        )
        .collect()
    )
    shards = {
        int(r["_shard"]): {"rows": r["rows"], "xor_checksum": r["xor_checksum"]}
        for r in rows
    }
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "shards": shards,
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        m = json.load(f)
    m["shards"] = {int(k): v for k, v in m["shards"].items()}
    return m


def verify_shards(spark: SparkSession, path: str) -> bool:
    """Re-scan the export and check it against its manifest (the consumer-side
    integrity gate). Raises on mismatch, returns True when clean."""
    m = read_manifest(path)
    back = spark.read.parquet(path)
    rows = (
        back.groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(md5_int(F.col(m["key"]).cast("string"))).alias("xor_checksum"),
        )
        .collect()
    )
    got = {
        int(r["_shard"]): {"rows": r["rows"], "xor_checksum": r["xor_checksum"]}
        for r in rows
    }
    if got != m["shards"]:
        bad = {s for s in set(got) | set(m["shards"]) if got.get(s) != m["shards"].get(s)}
        raise ValueError(f"shard verification failed for shards {sorted(bad)}")
    return True


def epoch_shuffle(df: DataFrame, key: str, epoch: int, id_col: str = "position") -> DataFrame:
    """Deterministic global training-order shuffle for one epoch: every row
    gets a dense position 0..n-1 under a seeded pseudo-random permutation
    (order by md5(key || epoch)). Reruns reproduce the epoch exactly;
    different epochs decorrelate orders — the property RNG-based shuffles
    lose on retry/speculation and that epoch-seeded dataloaders need.
    Scale: the permutation sort is the dense_ids range-partition (n-way, no
    single-task sort)."""
    from .scale import dense_ids

    tagged = df.withColumn(
        "__shuf", F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#e{epoch}")))
    )
    return dense_ids(tagged, ["__shuf"], id_col=id_col).drop("__shuf")

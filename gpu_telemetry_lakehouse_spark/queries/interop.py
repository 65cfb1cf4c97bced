"""Table-format interop probe: build a real ``_delta_log`` table from driver
data, read it back through the protocol reader, prove time travel.

`delta_interop.read_delta` consumes the industry transaction-log format
without a Delta runtime (see that module); this query makes the capability
driver-checkable: a partitioned Delta table is materialized in a scratch dir
from ``lineitem`` (protocol/metaData/add actions exactly as PROTOCOL.md
serializes them), version 1 purges one partition (remove actions — the GDPR
shape), and the result unions the per-partition rollup of BOTH snapshots.
The DuckDB oracle replays the same two rollups directly over ``lineitem`` —
valid because the parquet round-trip of longs/doubles is value-preserving
and the partition column is reconstituted from ``partitionValues``, which
this query wrote from the same grouping keys.
"""

from __future__ import annotations

import json
import os
import shutil
from hashlib import md5
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_REPO_ROOT = Path(__file__).resolve().parents[2]

_FLAGS = ["A", "N", "R"]


def _build_delta_table(spark: SparkSession, sf_dir: str, table: str) -> None:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("qty_c"),
    )
    adds = []
    for flag in _FLAGS:
        rel_dir = f"l_returnflag={flag}"
        part = li.where(F.col("l_returnflag") == flag).drop("l_returnflag")
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(table, rel_dir)
        )
        for f in sorted(os.listdir(os.path.join(table, rel_dir))):
            if f.endswith(".parquet"):
                adds.append(
                    {
                        "add": {
                            "path": f"{rel_dir}/{f}",
                            "partitionValues": {"l_returnflag": flag},
                            "size": 1,
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "l_orderkey", "type": "long",
                 "nullable": True, "metadata": {}},
                {"name": "qty_c", "type": "long",
                 "nullable": True, "metadata": {}},
                {"name": "l_returnflag", "type": "string",
                 "nullable": True, "metadata": {}},
            ],
        }
    )
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    v0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000001",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": ["l_returnflag"],
                "configuration": {},
            }
        },
        *adds,
        {"commitInfo": {"operation": "WRITE"}},
    ]
    # v1: purge the 'R' partition — remove actions only, zero data rewritten
    v1 = [
        {"remove": {"path": a["add"]["path"], "dataChange": True}}
        for a in adds
        if a["add"]["partitionValues"]["l_returnflag"] == "R"
    ] + [{"commitInfo": {"operation": "DELETE"}}]
    for v, actions in ((0, v0), (1, v1)):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")


@query(
    "delta_interop_snapshot",
    oracle="""
    SELECT 0 AS version, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_qty_c,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 1, l_returnflag,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT),
           CAST(SUM(l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_returnflag
    ORDER BY version, l_returnflag
    """,
)
def delta_interop_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a Delta-protocol table from lineitem, then roll up BOTH
    log versions through the interop reader (v0 full, v1 after a
    remove-only partition purge). Membership is pinned per partition via
    exact key/quantity sums; the v1 rows hash-matching the filtered oracle
    proves remove-action replay, and the reconstructed ``l_returnflag``
    column proves partitionValues deserialization. Log replay is metadata
    work; each snapshot read is an ordinary pruned parquet scan."""
    from .. import delta_interop as DI

    table = str(
        _REPO_ROOT
        / ".scratch"
        / "delta_interop"
        / md5(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(table, ignore_errors=True)
    _build_delta_table(spark, sf_dir, table)

    def rollup(version: int) -> DataFrame:
        snap = DI.read_delta(spark, table, version=version)
        return snap.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty_c").cast("long").alias("sum_qty_c"),
            F.sum("l_orderkey").cast("long").alias("sum_keys"),
        ).select(F.lit(version).cast("int").alias("version"), "*")

    return rollup(0).unionAll(rollup(1)).orderBy("version", "l_returnflag")

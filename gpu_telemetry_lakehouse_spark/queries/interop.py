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


def _build_delta_table(spark: SparkSession, sf_dir: str, table: str) -> None:
    """v0 through the real writer (write_delta: partitioned adds, protocol/
    metaData emission); v1 is a remove-only purge of the 'R' partition —
    zero data rewritten, the log alone changes the snapshot."""
    from .. import delta_interop as DI

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("qty_c"),
        "l_returnflag",
    )
    DI.write_delta(li, table, partition_by=["l_returnflag"])
    state = DI._replay(spark, table, 0)
    v1 = [
        {"remove": {"path": a["path"], "dataChange": True}}
        for a in sorted(state["files"].values(), key=lambda a: a["path"])
        if a["partitionValues"]["l_returnflag"] == "R"
    ] + [{"commitInfo": {"operation": "DELETE"}}]
    with open(
        os.path.join(table, "_delta_log", f"{1:020d}.json"), "w"
    ) as fh:
        for a in v1:
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


# --- tablog lifecycle under the driver -----------------------------------------
# medallion_end_to_end drives tablog's create/materialize path; the row-level
# DML half (MERGE, DELETE, time travel) has only pytest coverage. This query
# runs the full lifecycle against driver data and reads EVERY version back
# through time travel, so the external oracle hash-checks the version algebra:
#   v0 create  = orders with o_custkey % 10 = 0
#   v1 append  = orders with o_custkey % 10 = 1
#   v2 merge   = priority-'1-URGENT' rows of v0/v1 population, price doubled
#                (matched rows replaced, none inserted: the update set is
#                derived from the same population)
#   v3 delete  = drop '5-LOW'
# The oracle rebuilds each version's row set with plain SQL set algebra.


@query(
    "tablog_lifecycle_report",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_custkey % 10 = 0
    ),
    appended AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_custkey % 10 = 1
    ),
    v0 AS (SELECT * FROM base),
    v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM appended),
    v2 AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN o_orderpriority = '1-URGENT' THEN cents * 2
                    ELSE cents END AS cents
        FROM v1
    ),
    v3 AS (SELECT * FROM v2 WHERE o_orderpriority <> '5-LOW'),
    labeled AS (
        SELECT 0 AS version, * FROM v0
        UNION ALL SELECT 1, * FROM v1
        UNION ALL SELECT 2, * FROM v2
        UNION ALL SELECT 3, * FROM v3
    )
    -- version spine, not GROUP BY over the population: all four versions
    -- EXIST even when a version (or the whole corpus) is empty, exactly as
    -- the Spark side's per-version aggregates report them
    SELECT CAST(v.version AS INT) AS version,
           CAST(COUNT(l.o_orderkey) AS BIGINT) AS n_rows,
           CAST(SUM(l.cents) AS BIGINT) AS sum_cents,
           CAST(SUM(l.o_orderkey) AS BIGINT) AS sum_keys
    FROM (VALUES (0), (1), (2), (3)) v(version)
    LEFT JOIN labeled l ON l.version = v.version
    GROUP BY v.version ORDER BY v.version
    """,
)
def tablog_lifecycle_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create -> append -> MERGE -> DELETE, every version read via time
    travel and rolled up; the hash match against the set-algebra oracle
    certifies snapshot isolation and the version algebra, not just the tip.
    Row counts, exact cents and key sums pin membership per version."""
    from .. import tablog as TL

    table = str(
        _REPO_ROOT
        / ".scratch"
        / "tablog_lifecycle"
        / md5(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(table, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    base = o.where(F.col("o_custkey") % 10 == 0).select(
        "o_orderkey", "o_orderpriority", cents.alias("cents")
    )
    appended = o.where(F.col("o_custkey") % 10 == 1).select(
        "o_orderkey", "o_orderpriority", cents.alias("cents")
    )
    TL.create_table(base, table)
    TL.append(appended, table)
    updates = (
        TL.read(spark, table)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .withColumn("cents", F.col("cents") * 2)
    )
    TL.merge_upsert(spark, updates, table, key_cols=["o_orderkey"])
    TL.delete_where(spark, table, F.col("o_orderpriority") == "5-LOW")

    out = None
    for v in (0, 1, 2, 3):
        snap = TL.read(spark, table, version=v).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum("o_orderkey").cast("long").alias("sum_keys"),
        ).select(F.lit(v).cast("int").alias("version"), "*")
        out = snap if out is None else out.unionAll(snap)
    return out.orderBy("version")


@query(
    "tablog_change_feed_report",
    oracle="""
    WITH v0 AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_custkey % 10 = 0
    ),
    changed AS (SELECT * FROM v0 WHERE o_orderpriority = '1-URGENT'),
    inserted AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_custkey % 10 = 1
    ),
    feed AS (
        SELECT 'insert' AS change_type, o_orderkey, cents FROM inserted
        UNION ALL
        SELECT 'update_preimage', o_orderkey, cents FROM changed
        UNION ALL
        SELECT 'update_postimage', o_orderkey, cents * 2 FROM changed
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
    FROM feed GROUP BY change_type ORDER BY change_type
    """,
)
def tablog_change_feed_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed change-data-feed (Delta CDF semantic) under the external oracle.

    v0 = one customer cohort; one MERGE doubles urgent-priority cents AND
    inserts a second cohort; ``changes_between(0, 1)`` must emit exactly the
    insert rows plus pre/post-image pairs for the updates — counts, exact
    cents and key sums per change type hash-match the set-algebra oracle.
    The feed pairs rows BY KEY (an update is not a delete+insert), which is
    what cache-invalidation and reverse-ETL consumers rely on."""
    from .. import tablog as TL

    table = str(
        _REPO_ROOT
        / ".scratch"
        / "tablog_cdf"
        / md5(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(table, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    v0 = o.where(F.col("o_custkey") % 10 == 0).select(
        "o_orderkey", "o_orderpriority", cents.alias("cents")
    )
    TL.create_table(v0, table)
    updates = (
        TL.read(spark, table)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .withColumn("cents", F.col("cents") * 2)
        .unionAll(
            o.where(F.col("o_custkey") % 10 == 1).select(
                "o_orderkey", "o_orderpriority", cents.alias("cents")
            )
        )
    )
    TL.merge_upsert(spark, updates, table, key_cols=["o_orderkey"])
    feed = TL.changes_between(spark, table, 0, 1, key_cols=["o_orderkey"])
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum("o_orderkey").cast("long").alias("sum_keys"),
        )
        .orderBy("change_type")
    )

"""Physical-layout operators for the 100 TB tier.

The reference writes one parquet file per dataset and keeps every table in a
single-file DuckDB warehouse (pipelines/ingest_bronze.py:16, README.md:337) —
fine for one machine, fatal at 100 TB. This module supplies the three layout
tools a cluster deployment needs, each verified by a physical-plan test
(tests/test_scale.py):

1. **Partitioned writes + partition pruning** — `write_partitioned` lays a
   table out as `p_col=value/` directories so a filter on the partition
   column prunes whole directories at planning time (`PartitionFilters` in
   the scan, zero data files touched for excluded partitions).
2. **Bucketed co-located joins** — `write_bucketed` hash-buckets both join
   sides on the join key at write time; a later join reads bucket i against
   bucket i with NO exchange on either side. This is the only way a
   fact-to-fact join (lineitem ⋈ orders at 100 TB) avoids shuffling
   terabytes per query; the shuffle is paid once at ingest.
3. **Skew-defeating aggregation** — `two_phase_distinct` rewrites
   COUNT(DISTINCT x) GROUP BY k (whose single-exchange plan sends every
   (k, x) pair of a hot key to one reducer) into distinct-then-count: the
   first stage spreads a hot key's values across reducers keyed by
   (k, x); the second counts tiny per-key rows. `salted_collect` does the
   same for holistic aggs (collect_set/list) via an explicit salt column.

All helpers are pure layout/rewrite: results are bit-identical to the naive
plan (asserted in tests), only the exchange structure changes.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet write (`.../p=v/part-*.parquet`).

    Partition columns should be low-cardinality derivations (day, region
    key): one directory per value, so a time-range or region filter prunes
    at the driver without listing excluded directories' files. At 100 TB,
    day-partitioning a telemetry table turns a one-day query from a full
    scan into ~1/365th of one.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) external table.

    Both sides of a recurring large-large join written with the same
    `bucket_cols`/`n_buckets` join bucket-to-bucket with no exchange — and
    with `sort_cols` == join keys, no sort either: the SortMergeJoin reads
    pre-sorted buckets. The one-off shuffle happens here, at write time.

    The pre-write `repartition(n_buckets, bucket_cols)` keeps each bucket a
    SINGLE file: Spark's scan only trusts (and elides the read-side sort
    for) per-file sort order, so multi-file buckets would re-sort on every
    join. One shuffle at write time buys sort-free joins forever after.

    Note: since Spark 3.0 the scan reports bucket sort order only under
    `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (the default
    planner trades sort elision for multi-task bucket reads); exchange
    elision needs no conf. Set the legacy conf when the read-side sort is
    the bottleneck, e.g. repeated SMJs over the same sorted buckets.
    """
    w = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; plan must show zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key, at shuffle-join cost.

    A naive ``p.ts BETWEEN i.start AND i.end`` join has no equi condition,
    so Spark plans BroadcastNestedLoopJoin / CartesianProduct — O(n·m) row
    comparisons, a non-starter when the point side is 100 TB of telemetry
    (SURVEY.md §7 known-hard #5: "naive range join is O(n·m); needs
    time-bucketed equi-prejoin").

    This is that prejoin: each interval explodes into the fixed-width time
    buckets it overlaps (intervals are short — bursts, maintenance windows —
    so a handful of rows each), each point maps to exactly ONE bucket, and
    the bucket becomes the equi key of a plain hash/sort-merge join; the
    exact range predicate then filters within the bucket. Because a point
    lands in a single bucket, no post-join dedup is needed. Cost: one
    shuffle of each side keyed by bucket — identical shape to an ordinary
    equi-join, and AQE handles bucket skew like any hot key.

    Interval semantics are half-open [start, end), ``end > start`` required
    (an empty/negative interval would make the bucket sequence descend).
    Pick ``bucket_seconds`` ≈ the typical interval length: shorter buckets
    shrink within-bucket false candidates but multiply interval copies.
    """
    pt = points.withColumn(
        "__pt_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    )
    iv = intervals.withColumn(
        "__iv_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor((F.unix_timestamp(F.col(end_col)) - 1) / bucket_seconds),
            )
        ),
    )
    cond = (
        (pt["__pt_bucket"] == iv["__iv_bucket"])
        & (pt[ts_col] >= iv[start_col])
        & (pt[ts_col] < iv[end_col])
    )
    return pt.join(iv, cond, how).drop("__pt_bucket", "__iv_bucket")


def overwrite_dynamic_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Incremental refresh: rewrite ONLY the partitions present in ``df``.

    The reference full-refreshes every tier on every run
    (pipelines/flow_full_refresh.py:79-90) — at 100 TB that's rewriting a
    year of gold to update yesterday. With
    ``partitionOverwriteMode=dynamic``, an overwrite write replaces exactly
    the directories ``df`` contains rows for and leaves every other
    partition's files untouched (asserted byte-for-byte in
    tests/test_scale.py) — the parquet-native equivalent of
    ``MERGE``-by-partition: recompute the affected days from new data,
    write, done.

    Correct only when ``df`` holds the COMPLETE new content of each
    affected partition (the natural shape when gold days derive from the
    day's events); row-level upserts need a key-join rewrite or a table
    format (Delta/Iceberg) instead.
    """
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def two_phase_distinct(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """COUNT(DISTINCT col) GROUP BY keys, skew-proof.

    Stage 1 dedups on (keys, col) — a hot key's values hash across ALL
    reducers, with map-side partial dedup shrinking the exchange. Stage 2
    counts the surviving rows per key. Same two exchanges Spark plans for
    the naive query, but no reducer ever holds more than its hash-share of
    one key's distinct values.
    """
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{col}"))
    )


def salt_col(col: str | Column, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): hash of a high-cardinality column.

    Deterministic (vs `F.rand()`) so retried/speculated tasks land rows in
    the same salt bucket and differential tests reproduce.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_salt)).cast("int")


def salted_collect(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """collect_set(value_col) GROUP BY keys for skewed keys.

    Holistic aggs have no map-side combine, so a hot key funnels every row
    into one reducer. Salting splits each key into `n_salt` sub-groups
    (salt = hash(value) so duplicate values co-locate and pre-dedup), then a
    second, tiny aggregation flattens the per-salt sets. Two exchanges, but
    the big one is keyed (key, salt) — reducer load is bounded by
    rows/n_salt per hot key instead of all of them.
    """
    salted = df.withColumn("__salt", salt_col(value_col, n_salt))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_set(value_col).alias("__vals")
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("__vals")))).alias(
            f"{value_col}_set"
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that survives a hot key without AQE.

    A shuffle join sends every row of a hot key to ONE reducer; when a
    single key is 10% of 100 TB, that reducer runs for hours while the rest
    idle. Salting splits the hot side: each left row gets a deterministic
    salt in [0, n_salt) derived from the whole row (monotonically_increasing_id
    would break retry determinism, so we hash the partition-local position-
    free row content via xxhash64 over all columns), and the right side is
    replicated n_salt times — the join key becomes (key, salt), spreading
    each hot key across n_salt reducers.

    Replication multiplies the right side's shuffle volume by n_salt, so
    use when right is much smaller than the hot key's row count (the usual
    skew shape: huge skewed fact ⋈ modest table). Prefer AQE skew-join when
    it fires; this is the explicit fallback for joins AQE can't split
    (e.g. followed by a same-key aggregation Spark wants to co-partition).
    Results are exactly the naive join's rows (asserted in tests).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt)).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")


def upsert_by_key(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """Row-level MERGE (upsert) into a partitioned parquet table without a
    table format: new rows insert, existing keys are replaced.

    Plan shape: (1) prune — read ONLY the partitions the updates touch
    (broadcast semi-join on the partition values, so partition pruning
    fires); (2) anti-join current rows against the update keys; (3) union
    the updates; (4) dynamic-partition overwrite of just those partitions.
    Cost scales with the touched partitions, not the table.

    The localCheckpoint before the write breaks the read-from/write-to-same-
    path cycle (Spark refuses a self-overwriting plan). It materializes the
    touched partitions' merged content — bounded by the same touched-
    partition size the write itself rewrites. A production deployment on an
    object store gets this durability from a staging-dir write + rename, or
    from a table format (Delta/Iceberg) whose MERGE is this same plan with
    a transactional commit.
    """
    touched = updates.select(*partition_cols).distinct()
    current = spark.read.parquet(path).join(
        F.broadcast(touched), partition_cols, "left_semi"
    )
    merged = current.join(updates, key_cols, "left_anti").unionByName(
        updates
    ).localCheckpoint()
    overwrite_dynamic_partitions(merged, path, partition_cols)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Small-file compaction (the OPTIMIZE half of table maintenance).

    Streaming sinks and incremental refreshes accrete a file per trigger per
    partition; at scan time every file costs a task schedule + open + footer
    parse, so millions of small files dominate a 100 TB read. This rewrites
    each partition into ceil(partition_bytes / target) files: per-partition
    byte sizes drive a tiny (partition -> n_files) plan broadcast back onto
    the data, rows salt into that many reducers, and a dynamic-partition
    overwrite swaps in the compacted layout — untouched partitions' files
    are left as-is.
    """
    import math
    import os

    sizes: dict[tuple, int] = {}
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        kv = [p.split("=", 1) for p in rel.split(os.sep) if "=" in p]
        if len(kv) != len(partition_cols):
            continue
        key = tuple(v for _k, v in kv)
        sizes[key] = sizes.get(key, 0) + sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if not f.startswith(("_", "."))
        )
    if not sizes:
        return
    plan = spark.createDataFrame(
        [(*k, max(1, math.ceil(b / target_file_bytes))) for k, b in sizes.items()],
        partition_cols + ["__n_files"],
    )
    df = spark.read.parquet(path)
    # partition dir values come back typed; compare as strings to match the
    # directory-derived plan keys
    on = [df[c].cast("string") == plan[c] for c in partition_cols]
    salted = (
        df.join(F.broadcast(plan), functools.reduce(_op.and_, on))
        .drop(*[plan[c] for c in partition_cols])
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[df[c] for c in df.columns]), F.col("__n_files")),
        )
    )
    compacted = (
        salted.repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
        .drop("__n_files", "__salt")
        .localCheckpoint()
    )
    overwrite_dynamic_partitions(compacted, path, partition_cols)


def dense_ids(df: DataFrame, order_cols: list[str], id_col: str = "row_id") -> DataFrame:
    """Deterministic dense surrogate keys 0..n-1 in ``order_cols`` order,
    WITHOUT a single-partition global window (the naive
    ``row_number() OVER (ORDER BY ...)`` funnels the whole table through one
    task) and without ``monotonically_increasing_id`` (sparse, partitioning-
    dependent, not stable across reruns).

    The scalable decomposition: range-partition on the order columns (the
    same exchange a global sort needs — n-way, not 1-way), count rows per
    partition (a |partitions|-sized driver aggregate), broadcast the prefix
    offsets back, and add the partition-local row_number. Two jobs (count
    pass + id pass) over the range-partitioned frame; each window runs
    within its own partition."""
    from pyspark.sql import Window as W

    sc = df.sparkSession.sparkContext
    n_parts = max(2, min(sc.defaultParallelism, 64))
    # localCheckpoint pins ONE materialization of the range partitioning:
    # RangePartitioner samples bounds non-deterministically per execution,
    # so without it the count pass and the id pass can disagree on which
    # partition a row lands in — silently corrupting the offsets.
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    w = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn(
            id_col, (F.row_number().over(w) - 1 + off).cast("long")
        )
        .drop("__pid")
    )

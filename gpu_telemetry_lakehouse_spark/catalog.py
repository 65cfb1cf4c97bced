"""Testdata catalog: load the driver's synthetic parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. ``events.ts`` is parquet TIMESTAMP(NANOS) which
Spark cannot read natively — we read it as long
(``spark.sql.legacy.parquet.nanosAsLong``) and integer-divide to microseconds,
which matches DuckDB's ns->us truncation exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (sparkContext id, sf_dir, name) -> DataFrame. DataFrames are immutable and
# the testdata dirs never change, so handing the same object back is safe;
# a cold load_table costs ~0.1s of py4j/footer-read latency (conf sets,
# schema inference, dtype fetches) that otherwise taxes EVERY query build.
_TABLE_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with engine-canonical column types."""
    # Runtime confs (UTC tz, nanos-parquet, AQE) are SESSION-scoped, but the
    # table memo key is the shared sparkContext: a sibling session
    # (spark.newSession()) can hit a memo entry created by another session,
    # and must still get the canonical confs applied to ITS session. A full
    # apply is a batch of py4j conf.set round-trips on every query-build
    # path, so the guard is a single SENTINEL read:
    # spark.sql.legacy.parquet.nanosAsLong is in RUNTIME_CONFS, defaults to
    # false on any session we did not prepare (vanilla driver session,
    # sibling session, post-RESET), and is the conf this module itself
    # depends on (events.parquet is TIMESTAMP(NANOS)) — so any unprepared
    # session gets the full apply and an already-canonical session pays one
    # conf.get. (A surgical flip of one OTHER conf with the sentinel left
    # set escapes — no code path here does that, and pre-round-5 behavior
    # had the same exposure on memo hits.)
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        apply_runtime_confs(spark)
    key = (id(spark.sparkContext), os.path.abspath(sf_dir), name)
    hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long -> TimestampType (µs), truncating like DuckDB does.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    # Parquet naive (isAdjustedToUTC=false) timestamps surface as
    # TIMESTAMP_NTZ on newer Spark builds. The engine-canonical type is
    # TIMESTAMP (session tz pinned UTC, session.py), so the wall-clock value
    # is unchanged and chrono functions (unix_micros, window(), watermarks)
    # resolve. Cast is a zero-cost projection; Catalyst folds it into the scan.
    ntz_cols = [c for c, d in df.dtypes if d == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    _TABLE_MEMO[key] = df
    return df


def spread_input(df: DataFrame) -> DataFrame:
    """Spread a low-split source across cores before CPU-heavy row-local
    work (shingling, hashing, vector math).

    Local testdata ships each table as ONE parquet file with one row group,
    so a scan yields a single input split and featurization runs on one of
    N cores. At cluster scale (100 TB => tens of thousands of splits) the
    condition below is false and this is a no-op — production plans carry
    no extra exchange; locally it trades a sub-MB round-robin shuffle for
    N-way parallelism on the expensive expression evaluation."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    key = ("spread", id(sc), id(df))
    hit = _TABLE_MEMO.get(key)
    # the memo value pins the input df, so its id cannot be recycled while
    # the entry lives; the identity check guards the (impossible while
    # pinned, cheap to verify) id-reuse collision
    if hit is not None and hit[0] is df:
        return hit[1]
    # getNumPartitions forces physical planning of the scan (~50ms of
    # py4j+planner latency) — memoize per input frame so repeated query
    # builds over the same (memoized) table pay it once
    out = df.repartition(target) if df.rdd.getNumPartitions() < target else df
    _TABLE_MEMO[key] = (df, out)
    return out


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register temp views (bronze tier semantics: views over parquet,
    reference: models/bronze/bronze_job_events.sql:1-6)."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

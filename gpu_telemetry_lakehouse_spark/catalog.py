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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with engine-canonical column types."""
    apply_runtime_confs(spark)
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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register temp views (bronze tier semantics: views over parquet,
    reference: models/bronze/bronze_job_events.sql:1-6)."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

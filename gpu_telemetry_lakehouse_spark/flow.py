"""Full-refresh pipeline: ingest -> models -> checks -> ML scoring.

reference: pipelines/flow_full_refresh.py:79-90 — a Prefect flow of
subprocess hops (ingest, dbt run, dbt test, ML train, ML score). Spark-first:
one driver, function calls, DataFrames end to end; the only process
boundaries left are Spark shuffles.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

from . import models as M
from . import tablog as T
from .checks import run_reference_checks
from .ingest import ingest_all
from .ml.anomaly import DEFAULT_FEATURES, score_driver_side

log = logging.getLogger(__name__)

# Footer-stats columns per warehouse table — what tablog's file skipping
# prunes on (the dominant predicate column of each tier's consumers).
STAT_COLS: dict[str, list[str]] = {
    "silver_jobs": ["job_id"],
    "silver_gpu_timeseries": ["ts", "machine_id"],
    "gold_cluster_util_daily": ["dt"],
    "gold_cluster_util_daily_scored": ["dt"],
    "gold_job_efficiency_daily": ["dt"],
    "gold_user_gpu_usage_daily": ["dt"],
}


def _materialize(spark: SparkSession, df: DataFrame, path: str, name: str) -> DataFrame:
    """Persist a warehouse table through the versioned table format: first
    build is version 0, every refresh commits a new snapshot — the warehouse
    keeps its full history (time travel to any prior refresh) and readers
    never observe a half-written table (the reference's DuckDB CTAS gave the
    same atomicity single-node; tablog gives it on a distributed lake)."""
    stat_cols = STAT_COLS.get(name, [])
    if os.path.isdir(os.path.join(path, T.LOG_DIR)):
        T.overwrite(df, path, stat_cols=stat_cols)
    else:
        T.create_table(df, path, stat_cols=stat_cols)
    return T.read(spark, path)


def full_refresh(spark: SparkSession, source_dir: str, lake_dir: str) -> dict[str, DataFrame]:
    """Run the whole medallion pipeline; returns every built frame.

    Persisted tiers mirror the reference's materializations: bronze parquet
    (ingest), silver/gold as versioned tablog tables (our improvement — the
    reference overwrites single files with no history, SURVEY.md §1.4).
    """
    bronze = ingest_all(spark, source_dir, lake_dir)
    built = M.build_all(bronze)

    for name, m in M.MODELS.items():
        if m.materialized == "table" and name in built:
            path = os.path.join(lake_dir, "warehouse", name)
            built[name] = _materialize(spark, built[name], path, name)

    run_reference_checks(built)  # dbt test equivalent

    if "gold_cluster_util_daily" in built:
        scored = score_driver_side(spark, built["gold_cluster_util_daily"], DEFAULT_FEATURES)
        name = "gold_cluster_util_daily_scored"
        path = os.path.join(lake_dir, "warehouse", name)
        built[name] = _materialize(spark, scored, path, name)

    return built

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
from .checks import run_reference_checks
from .ingest import ingest_all
from .ml.anomaly import DEFAULT_FEATURES, score_driver_side

log = logging.getLogger(__name__)


def full_refresh(spark: SparkSession, source_dir: str, lake_dir: str) -> dict[str, DataFrame]:
    """Run the whole medallion pipeline; returns every built frame.

    Persisted tiers mirror the reference's materializations: bronze parquet
    (ingest), silver/gold parquet tables; gold is partitioned by day at scale
    (our improvement — the reference writes single files, SURVEY.md §1.4).
    """
    bronze = ingest_all(spark, source_dir, lake_dir)
    built = M.build_all(bronze)

    for name, m in M.MODELS.items():
        if m.materialized == "table" and name in built:
            path = os.path.join(lake_dir, "warehouse", name)
            built[name].write.mode("overwrite").parquet(path)
            built[name] = spark.read.parquet(path)

    run_reference_checks(built)  # dbt test equivalent

    if "gold_cluster_util_daily" in built:
        scored = score_driver_side(spark, built["gold_cluster_util_daily"], DEFAULT_FEATURES)
        path = os.path.join(lake_dir, "warehouse", "gold_cluster_util_daily_scored")
        scored.write.mode("overwrite").parquet(path)
        built["gold_cluster_util_daily_scored"] = spark.read.parquet(path)

    return built

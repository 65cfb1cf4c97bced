"""ML anomaly scoring query (rows-only: iterative tree ensemble is not
SQL-expressible; invariants are asserted in tests/test_ml.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ml.anomaly import score_driver_side
from .registry import query
from .core import gold_daily_util


@query("anomaly_daily", oracle=None)
def anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily utilization rollup + IsolationForest anomaly flags — the
    reference's end-to-end gold->scored pipeline on the events analog
    (reference: ml/score_cluster_anomalies.py:44-58)."""
    daily = gold_daily_util(spark, sf_dir)
    return score_driver_side(
        spark, daily, ["avg_value", "p95_value", "med_value"]
    )

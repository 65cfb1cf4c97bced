"""dbt-style data constraints as Spark assertions.

reference: models/silver/silver.yml:8-23 and models/gold/gold.yml:9-11 —
the seven unique/not_null tests, run post-build by ``dbt test``
(flow_full_refresh.py:49-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CheckError(AssertionError):
    pass


def expect_not_null(df: DataFrame, col: str, model: str = "") -> None:
    n = df.filter(F.col(col).isNull()).limit(1).count()
    if n:
        raise CheckError(f"{model}.{col}: NULLs present")


def expect_unique(df: DataFrame, col: str, model: str = "") -> None:
    dups = df.groupBy(col).count().filter(F.col("count") > 1).limit(1).count()
    if dups:
        raise CheckError(f"{model}.{col}: duplicate keys present")


# (model, column, check) — mirrors the reference's 7 declared tests
REFERENCE_CHECKS = [
    ("silver_jobs", "job_id", "unique"),
    ("silver_jobs", "job_id", "not_null"),
    ("silver_jobs", "user_id", "not_null"),
    ("silver_gpu_timeseries", "machine_id", "not_null"),
    ("silver_gpu_timeseries", "ts", "not_null"),
    ("gold_cluster_util_daily", "dt", "unique"),
    ("gold_cluster_util_daily", "dt", "not_null"),
]


def run_reference_checks(built: dict[str, DataFrame]) -> None:
    for model, col, kind in REFERENCE_CHECKS:
        if model not in built:
            continue
        (expect_unique if kind == "unique" else expect_not_null)(built[model], col, model)

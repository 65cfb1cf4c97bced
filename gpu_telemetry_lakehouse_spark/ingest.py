"""Bronze ingestion: CSV sources -> parquet lake (reference parity).

reference: pipelines/ingest_bronze.py:10-69 — five ``pd.read_csv`` ->
``to_parquet`` hops with row-count logging. Spark-first: declared schemas
(schemas.py), distributed CSV scan, parquet write; row counts logged per
dataset (the basis of the reference's published scale numbers, README.md:62-66).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import BRONZE_SOURCES

log = logging.getLogger(__name__)

# source csv filename per bronze dataset (reference: ingest_bronze.py:15-59)
SOURCE_FILES = {
    "bronze_job_events": "pai_job_table.csv",
    "bronze_instance_table": "pai_instance_table.csv",
    "bronze_machine_metrics": "pai_machine_metric.csv",
    "bronze_machine_spec": "pai_machine_spec.csv",
    "bronze_gpu_specs": "tpu_gpus.csv",
}


def ingest_csv(
    spark: SparkSession, src: str, schema: T.StructType, out_path: str
) -> DataFrame:
    """One CSV -> parquet hop with the declared schema.

    Row-count observability (reference X2, ingest_bronze.py:17) rides the
    write job itself via ``observe`` — no second scan. A separate ``count()``
    would re-read the data; at 100 TB that doubles ingest cost for a log line.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.read.schema(schema).option("header", True).csv(src)
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    df.write.mode("overwrite").parquet(out_path)
    log.info("Wrote %s rows -> %s", obs.get["rows"], out_path)
    return spark.read.parquet(out_path)


def ingest_all(spark: SparkSession, source_dir: str, lake_dir: str) -> dict[str, DataFrame]:
    """All five bronze datasets (skips sources missing on disk)."""
    out: dict[str, DataFrame] = {}
    for name, schema in BRONZE_SOURCES.items():
        src = os.path.join(source_dir, SOURCE_FILES[name])
        if not os.path.exists(src):
            log.warning("source %s missing, skipping %s", src, name)
            continue
        out[name] = ingest_csv(spark, src, schema, os.path.join(lake_dir, "bronze", name))
    return out

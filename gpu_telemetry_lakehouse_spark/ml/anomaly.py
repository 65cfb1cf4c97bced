"""Anomaly scoring over gold daily rollups (reference: ml/ pipeline).

Two execution paths with identical results:
- driver-side: gold is tiny (49 rows in the reference) -> collect, score,
  createDataFrame (reference: score_cluster_anomalies.py does exactly this
  through DuckDB+pandas).
- distributed: broadcast the fitted model, score via an Arrow-batched pandas
  UDF — the 100 TB path when scoring raw (non-aggregated) telemetry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .isolation_forest import IsolationForest, StandardScaler

DEFAULT_FEATURES = ["avg_gpu_util", "p95_gpu_util", "avg_cpu_util"]
# reference hyperparameters: ml/train_cluster_anomaly_model.py:42-46
N_ESTIMATORS, CONTAMINATION, SEED = 100, 0.05, 42


def train_on_matrix(X) -> tuple[StandardScaler, IsolationForest]:
    """Fit scaler + forest on an already-collected feature matrix."""
    scaler = StandardScaler().fit(X)
    forest = IsolationForest(
        n_estimators=N_ESTIMATORS, contamination=CONTAMINATION, seed=SEED
    ).fit(scaler.transform(X))
    return scaler, forest


def train(gold: DataFrame, features: list[str]) -> tuple[StandardScaler, IsolationForest]:
    """Fit scaler + forest on the (small) gold table, deterministic order
    (reference orders by dt before scoring; we sort by all feature cols)."""
    pdf = gold.select(features).toPandas()
    return train_on_matrix(pdf[features].to_numpy(dtype=float))


def score_driver_side(
    spark: SparkSession, gold: DataFrame, features: list[str]
) -> DataFrame:
    """Reference-shaped scoring: append anomaly_score / anomaly_flag.

    Gold is collected ONCE and both train and score run from that frame —
    the reference executes its gold query twice (train + score scripts each
    re-query DuckDB); one collect halves the aggregation work."""
    pdf = gold.toPandas()
    scaler, forest = train_on_matrix(pdf[features].to_numpy(dtype=float))
    X = scaler.transform(pdf[features].to_numpy(dtype=float))
    pdf["anomaly_score"] = forest.score_samples(X).round(6)
    pdf["anomaly_flag"] = forest.predict_flags(X)
    schema = T.StructType(
        gold.schema.fields
        + [
            T.StructField("anomaly_score", T.DoubleType()),
            T.StructField("anomaly_flag", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)


def score_distributed(
    df: DataFrame, scaler: StandardScaler, forest: IsolationForest, features: list[str]
) -> DataFrame:
    """Scale path: broadcast model into an Arrow-batched pandas UDF."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((scaler, forest))

    @F.pandas_udf(T.DoubleType())
    def score_udf(*cols: pd.Series) -> pd.Series:
        sc, fo = bc.value
        X = sc.transform(pd.concat(cols, axis=1).to_numpy(dtype=float))
        return pd.Series(fo.score_samples(X)).round(6)

    scored = df.withColumn("anomaly_score", score_udf(*[F.col(c) for c in features]))
    return scored.withColumn(
        "anomaly_flag", (F.col("anomaly_score") >= float(forest.threshold_)).cast("int")
    )

"""Native Spark ML (pyspark.ml) feature path — the cluster-scale twin of the
sklearn-free scaler in isolation_forest.py.

The reference standardizes features with sklearn's StandardScaler
(reference ml/train_cluster_anomaly_model.py:39-40, population std ddof=0);
``pyspark.ml.feature.StandardScaler`` computes the SAMPLE std (ddof=1) —
a real cross-library semantic difference this module documents and its test
pins, so a user switching to the native pipeline knows exactly what moves.
Use this path when the feature matrix is too large to collect: fit and
transform are distributed, and the fitted PipelineModel persists with
Spark ML's own save/load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fit_scaled_features(df: DataFrame, cols: list[str], out_col: str = "scaled"):
    """VectorAssembler -> StandardScaler(withMean, withStd) as one
    pyspark.ml Pipeline; returns (fitted PipelineModel, transformed df)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    va = VectorAssembler(inputCols=cols, outputCol="__features")
    sc = StandardScaler(
        inputCol="__features", outputCol=out_col, withMean=True, withStd=True
    )
    model = Pipeline(stages=[va, sc]).fit(df)
    return model, model.transform(df).drop("__features")


def fit_embedding_classifier(
    train: DataFrame, vec_col: str = "embedding", label_col: str = "label"
):
    """Distributed multinomial logistic regression over an embedding column:
    array<float> -> ml.linalg vector via array_to_vector (no Python-row
    conversion), then LogisticRegression on the JVM. The cluster-scale
    supervised twin of the anomaly path — fit/predict never collect the
    corpus; the model is coefficients-sized (k x dim).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    # Dimension-uniformity gate: LBFGS over a ragged embedding column dies
    # deep in the JVM with an undiagnosable Py4J error; one cheap agg on
    # the training scan (negligible next to 50 LBFGS sweeps) names the
    # corpus defect instead (ragged-embedding corpus class, round 9).
    lo, hi = train.agg(
        F.min(F.size(vec_col)), F.max(F.size(vec_col))
    ).first()
    if lo != hi:
        raise ValueError(
            f"fit_embedding_classifier: embedding dimensions are "
            f"inconsistent across rows (min {lo}, max {hi}) — a ragged "
            "embedding column cannot be fitted; re-embed or filter to a "
            "single dimension first"
        )
    prepped = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    lr = LogisticRegression(maxIter=50, regParam=0.01, tol=1e-6)
    return lr.fit(prepped)


def score_embedding_classifier(model, df: DataFrame, vec_col: str = "embedding"):
    """Append ``prediction`` to ``df`` via the fitted model (row-local JVM
    transform; model broadcast by value)."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    prepped = df.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    return model.transform(prepped).drop("features", "rawPrediction", "probability")


def fit_implicit_als(
    interactions: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    rank: int = 8,
    reg: float = 0.1,
    alpha: float = 10.0,
    iters: int = 5,
    seed: int = 42,
):
    """Implicit-feedback ALS (Hu/Koren/Volinsky 2008) via Spark ML — the
    fully distributed recommender: factor matrices live blocked across the
    cluster, each sweep is a join-shaped least-squares solve, and nothing
    corpus-sized ever reaches the driver. coldStartStrategy='drop' keeps
    evaluation NaN-free."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=iters,
        regParam=reg,
        alpha=alpha,
        implicitPrefs=True,
        seed=seed,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
        nonnegative=True,
    )
    return als.fit(interactions)

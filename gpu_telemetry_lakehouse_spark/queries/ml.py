"""ML anomaly scoring query (rows-only: iterative tree ensemble is not
SQL-expressible; invariants are asserted in tests/test_ml.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
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


# --- supervised embedding classifier (rows-only: LBFGS logreg training is
# not SQL-expressible; accuracy invariants pinned in tests/test_ml.py) -------
@query("logreg_embedding_eval")
def logreg_embedding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multinomial logistic regression on the embeddings table
    with a deterministic md5 train/test split (ml/native.py), reported as a
    per-class train-vs-test accuracy table — the generalization-gap
    diagnostic a feature-quality pipeline runs before trusting an embedding
    column (the synthetic embeddings' labels memorize but barely
    generalize, and the report shows exactly that). Train and score are
    fully distributed (array_to_vector + JVM LogisticRegression); only the
    k x dim coefficient matrix ever reaches the driver."""
    from ..functions import md5_int
    from ..ml.native import fit_embedding_classifier, score_embedding_classifier

    emb = load_table(spark, sf_dir, "embeddings")
    # deterministic 80/20 split on the hash of the id — reproducible across
    # runs and engines, no RNG state
    split = emb.withColumn("h", md5_int(F.col("vec_id").cast("string")) % 5)
    train = split.filter(F.col("h") != 0)
    test = split.filter(F.col("h") == 0)
    model = fit_embedding_classifier(train)

    def report(df: DataFrame, split_name: str) -> DataFrame:
        scored = score_embedding_classifier(model, df)
        return (
            scored.groupBy(F.col("label").alias("true_label"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        F.col("prediction") == F.col("label").cast("double"), 1
                    ).otherwise(0)
                ).alias("n_correct"),
            )
            .select(
                F.lit(split_name).alias("split"),
                "true_label",
                "n",
                "n_correct",
                F.round(F.col("n_correct") / F.col("n"), 4).alias("accuracy"),
            )
        )

    return report(train, "train").unionByName(report(test, "test"))


# --- implicit-feedback ALS recommender (rows-only: alternating least
# squares is iterative and not SQL-expressible; ranking-quality and
# determinism invariants pinned in tests/test_ml.py) -------------------------
@query("als_recommend_parts")
def als_recommend_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 part recommendations per customer from implicit purchase
    feedback (lineitem counts per customer x part), trained with
    distributed implicit ALS (ml/native.py::fit_implicit_als). The
    interaction matrix is built relationally (orders join lineitem, one
    shuffle); recommendForAllUsers is the blocked cross-factor top-k —
    factors never collect. Output: (customer, rank position, part, score)."""
    from ..ml.native import fit_implicit_als

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    inter = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    model = fit_implicit_als(inter)
    recs = model.recommendForAllUsers(5)
    return (
        recs.select(
            F.col("user").alias("custkey"),
            F.posexplode("recommendations").alias("pos", "rec"),
        )
        .select(
            "custkey",
            (F.col("pos") + 1).alias("rec_rank"),
            F.col("rec.item").alias("partkey"),
            F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
        )
        .orderBy("custkey", "rec_rank")
    )

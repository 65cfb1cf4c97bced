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


# --- decision stump trained by pure aggregation ------------------------------
# Greedy tree induction IS histogram aggregation: one pass builds the
# (feature-bucket x label) contingency cells, cumulative windows over the
# (tiny) per-feature margins enumerate every candidate split, and the
# weighted-Gini argmin picks the stump — the exact mechanics XGBoost/LightGBM
# histogram modes run per node, here fully SQL-expressible so the oracle
# replays split selection bit-for-bit. Gini terms are integer-derived
# ((n² - pos² - neg²)/n from exact BIGINT counts) and round to 1e-6-scaled
# longs before the argmin, so the chosen split is partition-order-proof.
#
# Scale: the only corpus-sized work is the label join (shuffle on orderkey)
# and the 50-cell contingency aggregation (map-side combined); candidate
# enumeration and the argmin run over <=13 rows. Deeper trees = recurse on
# the cells frame, same shape per node.
@query(
    "decision_stump_returns",
    oracle="""
    WITH ret AS (
        SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    lab AS (
        SELECT LEAST(9, CAST(FLOOR(o.o_totalprice / 30000) AS INT)) AS pb,
               CAST(substring(o.o_orderpriority, 1, 1) AS INT) AS pri,
               CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
        FROM orders o LEFT JOIN ret r ON r.l_orderkey = o.o_orderkey
    ),
    cells AS (
        SELECT pb, pri, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
        FROM lab GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
               CAST(SUM(pos) AS BIGINT) AS pos_tot
        FROM cells
    ),
    mp AS (
        SELECT pb AS fv, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS pos
        FROM cells GROUP BY 1
    ),
    mq AS (
        SELECT pri AS fv, CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS pos
        FROM cells GROUP BY 1
    ),
    cp AS (
        SELECT 'price_bucket' AS feature, CAST(fv AS INT) AS threshold,
               CAST(SUM(n) OVER w AS BIGINT) AS nl,
               CAST(SUM(pos) OVER w AS BIGINT) AS pl
        FROM mp
        WINDOW w AS (ORDER BY fv ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    cq AS (
        SELECT 'priority' AS feature, CAST(fv AS INT) AS threshold,
               CAST(SUM(n) OVER w AS BIGINT) AS nl,
               CAST(SUM(pos) OVER w AS BIGINT) AS pl
        FROM mq
        WINDOW w AS (ORDER BY fv ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    cand AS (
        SELECT c.feature, c.threshold, c.nl, c.pl,
               t.n_tot - c.nl AS nr, t.pos_tot - c.pl AS pr, t.n_tot
        FROM (
            SELECT * FROM cp WHERE threshold < 9
            UNION ALL
            SELECT * FROM cq WHERE threshold < 5
        ) c CROSS JOIN tot t
        WHERE c.nl > 0 AND t.n_tot - c.nl > 0
    ),
    scored AS (
        SELECT *,
               CAST(ROUND((
                   CAST(nl * nl - pl * pl - (nl - pl) * (nl - pl) AS DOUBLE)
                       / CAST(nl AS DOUBLE)
                   + CAST(nr * nr - pr * pr - (nr - pr) * (nr - pr) AS DOUBLE)
                       / CAST(nr AS DOUBLE)
               ) * 1000000) AS BIGINT) AS gini_s
        FROM cand
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY gini_s, feature, threshold) AS rn
        FROM scored
    )
    SELECT feature, threshold,
           ROUND(CAST(gini_s AS DOUBLE) / 1000000.0, 6) AS gini,
           CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS left_pred,
           CASE WHEN 2 * pr > nr THEN 1 ELSE 0 END AS right_pred,
           n_tot AS n_train,
           ROUND(CAST((CASE WHEN 2 * pl > nl THEN pl ELSE nl - pl END
                       + CASE WHEN 2 * pr > nr THEN pr ELSE nr - pr END)
                      AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS accuracy
    FROM best WHERE rn = 1
    """,
)
def decision_stump_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    lab = orders.join(
        ret, orders["o_orderkey"] == ret["l_orderkey"], "left"
    ).select(
        F.least(F.lit(9), F.floor(F.col("o_totalprice") / 30000).cast("int"))
        .alias("pb"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("pri"),
        F.when(F.col("l_orderkey").isNotNull(), 1).otherwise(0).alias("y"),
    )
    cells = lab.groupBy("pb", "pri").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("pos")
    )
    tot = cells.groupBy().agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("pos").cast("long").alias("pos_tot"),
    )
    wcum = W.orderBy("fv").rowsBetween(W.unboundedPreceding, W.currentRow)

    def cand_for(col: str, label: str, max_t: int) -> DataFrame:
        margin = cells.groupBy(F.col(col).alias("fv")).agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("pos"),
        )
        return (
            margin.select(
                F.lit(label).alias("feature"),
                F.col("fv").cast("int").alias("threshold"),
                F.sum("n").over(wcum).cast("long").alias("nl"),
                F.sum("pos").over(wcum).cast("long").alias("pl"),
            )
            .filter(F.col("threshold") < max_t)
        )

    cand = (
        cand_for("pb", "price_bucket", 9)
        .unionByName(cand_for("pri", "priority", 5))
        .crossJoin(F.broadcast(tot))
        .withColumn("nr", F.col("n_tot") - F.col("nl"))
        .withColumn("pr", F.col("pos_tot") - F.col("pl"))
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    nl, pl, nr, pr = (F.col(c) for c in ("nl", "pl", "nr", "pr"))
    gini_s = F.round(
        (
            (nl * nl - pl * pl - (nl - pl) * (nl - pl)).cast("double")
            / nl.cast("double")
            + (nr * nr - pr * pr - (nr - pr) * (nr - pr)).cast("double")
            / nr.cast("double")
        )
        * 1_000_000,
        0,
    ).cast("long")
    scored = cand.withColumn("gini_s", gini_s)
    wbest = W.orderBy("gini_s", "feature", "threshold")
    left_pred = F.when(2 * pl > nl, 1).otherwise(0)
    right_pred = F.when(2 * pr > nr, 1).otherwise(0)
    correct = F.when(2 * pl > nl, pl).otherwise(nl - pl) + F.when(
        2 * pr > nr, pr
    ).otherwise(nr - pr)
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "feature",
            "threshold",
            F.round(F.col("gini_s").cast("double") / 1e6, 6).alias("gini"),
            left_pred.alias("left_pred"),
            right_pred.alias("right_pred"),
            F.col("n_tot").alias("n_train"),
            F.round(correct.cast("double") / F.col("n_tot").cast("double"), 6)
            .alias("accuracy"),
        )
    )

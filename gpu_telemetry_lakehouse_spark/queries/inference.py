"""Statistical-inference operators: resampling CIs, robust trends, and
variance-reduced experiment readouts.

At 100 TB you cannot bootstrap by materializing resampled copies of the
data; the scale-correct technique is the POISSON BOOTSTRAP (each row
contributes an independent Poisson(1) multiplicity per replicate, so all B
replicates stream through one pass). Here the Poisson draws come from
md5-derived uniforms through an inverse-CDF CASE ladder — deterministic,
engine-portable, oracle-checkable — instead of RNG state.

All cross-engine arithmetic uses the scaled-long exact forms from
``functions.exact_sum`` (see queries/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_input
from ..functions import exact_avg, exact_sum, md5_int, tokens
from .registry import query

# Poisson(1) inverse-CDF thresholds quantized to 6 hex digits: the uniform
# is the md5's FIRST 6 HEX CHARS compared lexicographically, so the hot path
# is one md5 + one string compare per (row, replicate) — no hex->bigint
# conversion (conv() is BigInteger-backed and dominated the 10M-row stage at
# 5x the cost) and no division. Quantization shifts each threshold by
# < 6e-8 probability mass (immaterial statistically); both engines use the
# SAME quantized ladder so the draw stays bit-identical.
_POIS_HEX = ["5e2d58", "bc5ab1", "eb715e", "fb2397", "ff1025", "ffd90f", "fffa8b"]
_B = 100  # bootstrap replicates


def _pois_case_sql(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < '{t}' THEN {k}" for k, t in enumerate(_POIS_HEX)
    )
    return f"CASE {branches} ELSE 7 END"


def _pois_case(h):
    expr = F.when(h < _POIS_HEX[0], 0)
    for k, t in enumerate(_POIS_HEX[1:], start=1):
        expr = expr.when(h < t, k)
    return expr.otherwise(7)


@query(
    "bootstrap_ci_event_value",
    oracle=f"""
    WITH reps AS (
        SELECT e.event_type, CAST(u.b AS INT) AS b,
               substr(md5(CAST(e.event_id AS VARCHAR) || '_' ||
                      CAST(u.b AS VARCHAR)), 1, 6) AS h6,
               e.value
        FROM events e CROSS JOIN UNNEST(range(1, {_B + 1})) AS u(b)
        WHERE e.value IS NOT NULL
    ),
    wm AS (
        SELECT event_type, b,
               (SUM(CAST(FLOOR(({_pois_case_sql("h6")}) * value * 10000 + 0.5) AS BIGINT)) / 10000.0)
               / NULLIF(SUM({_pois_case_sql("h6")}), 0) AS rep_mean
        FROM reps GROUP BY event_type, b
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_reps,
           ROUND(quantile_cont(rep_mean, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(rep_mean, 0.5), 6) AS ci_mid,
           ROUND(quantile_cont(rep_mean, 0.975), 6) AS ci_hi
    FROM wm GROUP BY event_type ORDER BY event_type
    """,
)
def bootstrap_ci_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean event value per type: one pass,
    {_B} replicates riding along as weighted partial aggregates — the
    resample-at-scale technique (no data copies; the explode is a row-local
    flatMap and the replicate dimension folds straight into the group-by).
    The multiplicity is the inverse Poisson(1) CDF of a deterministic
    md5-uniform keyed by (row, replicate), so both engines draw the SAME
    bootstrap — the CI is hash-checkable, not just statistically similar."""
    ev = spread_input(
        load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    )
    h6 = F.substring(
        F.md5(
            F.concat(
                F.col("event_id").cast("string"), F.lit("_"), F.col("b").cast("string")
            )
        ),
        1,
        6,
    )
    reps = ev.select(
        "event_id",
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(_B))).alias("b"),
    ).select(
        "event_type",
        "b",
        "value",
        _pois_case(h6).alias("w"),
    )
    m = F.lit(10**4)
    wm = reps.groupBy("event_type", F.col("b").cast("int").alias("b")).agg(
        (
            (F.sum(F.floor(F.col("w") * F.col("value") * m + F.lit(0.5)).cast("long")) / m.cast("double"))
            / F.nullif(F.sum("w"), F.lit(0))
        ).alias("rep_mean")
    )
    return (
        wm.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_reps"),
            F.round(F.expr("percentile(rep_mean, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(rep_mean, 0.5)"), 6).alias("ci_mid"),
            F.round(F.expr("percentile(rep_mean, 0.975)"), 6).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@query(
    "theilsen_daily_trend",
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS dt,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / COUNT(value) AS avg_v
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    x AS (
        SELECT dt, avg_v,
               date_diff('day', (SELECT MIN(dt) FROM d), dt) AS xi
        FROM d
    ),
    slopes AS (
        SELECT (b.avg_v - a.avg_v) / CAST(b.xi - a.xi AS DOUBLE) AS slope
        FROM x a JOIN x b ON b.xi > a.xi
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope,
           ROUND(quantile_cont(slope, 0.25), 6) AS slope_q1,
           ROUND(quantile_cont(slope, 0.75), 6) AS slope_q3
    FROM slopes
    """,
)
def theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily mean value: median of all
    pairwise slopes — outlier-resistant where OLS (forecast_daily_events)
    is not. The pairwise self-join runs over the DAILY aggregate
    (|days|^2/2 pairs — time-bounded, not data-bounded: 10 years is ~6.6M
    pairs regardless of corpus size), so the only full-data pass is the
    day rollup."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dt")).agg(
        exact_avg("value").alias("avg_v")
    )
    mn = d.agg(F.min("dt").alias("min_dt"))
    x = d.join(F.broadcast(mn)).select(
        F.datediff("dt", "min_dt").alias("xi"), "avg_v"
    )
    a = x.select(F.col("xi").alias("xa"), F.col("avg_v").alias("ya"))
    b = x.select(F.col("xi").alias("xb"), F.col("avg_v").alias("yb"))
    slopes = a.join(F.broadcast(b), F.col("xb") > F.col("xa")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa")).cast("double")).alias(
            "slope"
        )
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_slope"),
        F.round(F.expr("percentile(slope, 0.25)"), 6).alias("slope_q1"),
        F.round(F.expr("percentile(slope, 0.75)"), 6).alias("slope_q3"),
    )


@query(
    "cuped_experiment_readout",
    oracle=f"""
    WITH assign AS (
        SELECT user_id,
               CASE WHEN (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                          AS BIGINT)) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    per_user AS (
        SELECT e.user_id,
               (SUM(CAST(FLOOR(CASE WHEN e.ts >= TIMESTAMP '2024-01-16' THEN e.value
                                    ELSE 0 END * 10000 + 0.5) AS BIGINT)) / 10000.0) AS y,
               (SUM(CAST(FLOOR(CASE WHEN e.ts < TIMESTAMP '2024-01-16' THEN e.value
                                    ELSE 0 END * 10000 + 0.5) AS BIGINT)) / 10000.0) AS x
        FROM events e WHERE e.value IS NOT NULL
        GROUP BY e.user_id
    ),
    moments AS (
        SELECT (SUM(CAST(FLOOR(x * 10000 + 0.5) AS BIGINT)) / 10000.0) / COUNT(*) AS mx,
               (SUM(CAST(FLOOR(y * 10000 + 0.5) AS BIGINT)) / 10000.0) / COUNT(*) AS my,
               (SUM(CAST(FLOOR(x * y * 100 + 0.5) AS BIGINT)) / 100.0) / COUNT(*) AS mxy,
               (SUM(CAST(FLOOR(x * x * 100 + 0.5) AS BIGINT)) / 100.0) / COUNT(*) AS mxx
        FROM per_user
    ),
    theta AS (
        SELECT (mxy - mx * my) / NULLIF(mxx - mx * mx, 0) AS th, mx FROM moments
    )
    SELECT a.arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND((SUM(CAST(FLOOR(p.y * 10000 + 0.5) AS BIGINT)) / 10000.0)
                 / COUNT(*), 6) AS raw_mean,
           ROUND((SUM(CAST(FLOOR((p.y - t.th * (p.x - t.mx)) * 10000 + 0.5) AS BIGINT)) / 10000.0)
                 / COUNT(*), 6) AS cuped_mean
    FROM per_user p
    JOIN assign a USING (user_id)
    CROSS JOIN theta t
    GROUP BY a.arm ORDER BY a.arm
    """,
)
def cuped_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: per-user outcome y (experiment
    period) adjusted by the pre-period covariate x via
    y' = y - theta*(x - mean(x)), theta = cov(x,y)/var(x) — the standard
    trick that cuts experiment runtimes by the covariate's R^2. theta's
    moments are ONE ungrouped aggregate broadcast back into the plan (no
    driver round-trip); every moment is a scaled-long exact sum so both
    engines agree bitwise."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        exact_sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("y"),
        exact_sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("x"),
    )
    moments = per_user.agg(
        exact_avg("x", scale=4).alias("mx"),
        exact_avg("y", scale=4).alias("my"),
        (exact_sum(F.col("x") * F.col("y"), scale=2) / F.count(F.lit(1))).alias("mxy"),
        (exact_sum(F.col("x") * F.col("x"), scale=2) / F.count(F.lit(1))).alias("mxx"),
    )
    theta = moments.select(
        (
            (F.col("mxy") - F.col("mx") * F.col("my"))
            / F.nullif(F.col("mxx") - F.col("mx") * F.col("mx"), F.lit(0))
        ).alias("th"),
        "mx",
    )
    arm = F.when(
        md5_int(F.col("user_id").cast("string")) % 2 == 0, "control"
    ).otherwise("treatment")
    m = F.lit(10**4)
    return (
        per_user.withColumn("arm", arm)
        .join(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(exact_avg("y", scale=4), 6).alias("raw_mean"),
            F.round(
                (
                    F.sum(
                        F.floor(
                            (F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))) * m
                            + F.lit(0.5)
                        ).cast("long")
                    )
                    / m.cast("double")
                )
                / F.count(F.lit(1)),
                6,
            ).alias("cuped_mean"),
        )
        .orderBy("arm")
    )


@query(
    "higher_moment_stats",
    oracle="""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                   / COUNT(*) AS mean_v
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    c AS (
        SELECT e.event_type, m.n, m.mean_v,
               (SUM(CAST(FLOOR((e.value - m.mean_v) * (e.value - m.mean_v) * 100 + 0.5) AS BIGINT)) / 100.0) / m.n AS m2,
               (SUM(CAST(FLOOR((e.value - m.mean_v) * (e.value - m.mean_v) * (e.value - m.mean_v) * 0.01 + 0.5) AS BIGINT)) * 100.0) / m.n AS m3,
               (SUM(CAST(FLOOR((e.value - m.mean_v) * (e.value - m.mean_v) * (e.value - m.mean_v) * (e.value - m.mean_v) * 0.0001 + 0.5) AS BIGINT)) * 10000.0) / m.n AS m4
        FROM events e JOIN m USING (event_type)
        WHERE e.value IS NOT NULL
        GROUP BY e.event_type, m.n, m.mean_v
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(mean_v, 6) AS mean_v,
           ROUND(sqrt(m2), 6) AS stddev_pop,
           ROUND(m3 / NULLIF(m2 * sqrt(m2), 0), 6) AS skewness,
           ROUND(m4 / NULLIF(m2 * m2, 0) - 3.0, 6) AS excess_kurtosis
    FROM c ORDER BY event_type
    """,
)
def higher_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stddev, skewness, excess kurtosis per event type from
    EXACT central moments: the group mean is computed first (scaled-long
    sum), broadcast back, and each centered power is rounded to a scaled
    long before summation — so the two engines' floating-point addition
    order cannot diverge the third/fourth moments, which are notoriously
    cancellation-sensitive. Two passes (mean, then centered moments) by
    design: the one-pass raw-moment formula m4 - 4*m3*m + ... loses ~8
    digits to cancellation at these magnitudes and would not hash-match.
    Spark's built-in skewness()/kurtosis() remain the single-pass
    approximate tier; this is the deterministic exact tier."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), exact_avg("value").alias("mean_v")
    )
    d = F.col("value") - F.col("mean_v")
    c = (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n", "mean_v")
        .agg(
            (F.sum(F.floor(d * d * 100 + F.lit(0.5)).cast("long")) / F.lit(100.0) / F.col("n")).alias("m2"),
            (F.sum(F.floor(d * d * d * 0.01 + F.lit(0.5)).cast("long")) * F.lit(100.0) / F.col("n")).alias("m3"),
            (F.sum(F.floor(d * d * d * d * 0.0001 + F.lit(0.5)).cast("long")) * F.lit(10000.0) / F.col("n")).alias("m4"),
        )
    )
    return c.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("mean_v", 6).alias("mean_v"),
        F.round(F.sqrt("m2"), 6).alias("stddev_pop"),
        # NULLIF: a zero-variance group (single observation) has no defined
        # shape moments — NULL on both engines, not an ANSI 0/0
        F.round(
            F.col("m3") / F.nullif(F.col("m2") * F.sqrt("m2"), F.lit(0.0)), 6
        ).alias("skewness"),
        F.round(
            F.col("m4") / F.nullif(F.col("m2") * F.col("m2"), F.lit(0.0))
            - 3.0,
            6,
        ).alias("excess_kurtosis"),
    ).orderBy("event_type")


@query(
    "correlation_matrix_lineitem",
    oracle="""
    WITH p AS (
        SELECT u.ca AS col_a, u.cb AS col_b,
               CASE u.ca WHEN 'l_quantity' THEN l_quantity
                         WHEN 'l_extendedprice' THEN l_extendedprice
                         ELSE l_discount END AS va,
               CASE u.cb WHEN 'l_extendedprice' THEN l_extendedprice
                         WHEN 'l_discount' THEN l_discount
                         ELSE l_tax END AS vb
        FROM lineitem
        CROSS JOIN (VALUES ('l_quantity','l_extendedprice'),
                           ('l_quantity','l_discount'),
                           ('l_quantity','l_tax'),
                           ('l_extendedprice','l_discount'),
                           ('l_extendedprice','l_tax'),
                           ('l_discount','l_tax')) u(ca, cb)
    ),
    m AS (
        SELECT col_a, col_b, COUNT(*) AS n,
               (SUM(CAST(FLOOR(va * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / COUNT(*) AS ma,
               (SUM(CAST(FLOOR(vb * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / COUNT(*) AS mb
        FROM p GROUP BY col_a, col_b
    )
    SELECT p.col_a, p.col_b,
           ROUND(
             ((SUM(CAST(FLOOR((p.va - m.ma) * (p.vb - m.mb) * 10000 + 0.5) AS BIGINT)) / 10000.0) / m.n)
             / NULLIF(sqrt(
                 ((SUM(CAST(FLOOR((p.va - m.ma) * (p.va - m.ma) * 10000 + 0.5) AS BIGINT)) / 10000.0) / m.n)
               * ((SUM(CAST(FLOOR((p.vb - m.mb) * (p.vb - m.mb) * 10000 + 0.5) AS BIGINT)) / 10000.0) / m.n)
             ), 0), 6) AS pearson_r
    FROM p JOIN m USING (col_a, col_b)
    GROUP BY p.col_a, p.col_b, m.n
    ORDER BY p.col_a, p.col_b
    """,
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations across four lineitem measures in ONE
    unpivoted plan: the pair dimension is a 6-row broadcast pattern table,
    so the fact table streams through once per... no — once TOTAL: the
    cross join replicates rows 6x inside the stage (row-local flatMap, no
    extra scan), and all pairs aggregate in the same shuffle. Centered
    products are scaled-long exact, same rationale as higher_moment_stats.
    The built-in one-pass corr() is the approximate tier."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
        ("l_discount", "l_tax"),
    ]
    arms = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(a).alias("va"),
                F.col(b).alias("vb"),
            )
            for a, b in pairs
        ]
    )
    p = li.select(F.explode(arms).alias("u")).select("u.*")
    m = p.groupBy("col_a", "col_b").agg(
        F.count(F.lit(1)).alias("n"),
        exact_avg("va").alias("ma"),
        exact_avg("vb").alias("mb"),
    )
    da, db = F.col("va") - F.col("ma"), F.col("vb") - F.col("mb")
    sc = F.lit(10**4)
    ex = lambda e: F.sum(F.floor(e * sc + F.lit(0.5)).cast("long")) / sc.cast("double") / F.col("n")  # noqa: E731
    return (
        p.join(F.broadcast(m), ["col_a", "col_b"])
        .groupBy("col_a", "col_b", "n")
        .agg(
            F.round(
                ex(da * db) / F.nullif(F.sqrt(ex(da * da) * ex(db * db)), F.lit(0.0)), 6
            ).alias("pearson_r")
        )
        .drop("n")
        .orderBy("col_a", "col_b")
    )


@query(
    "weighted_median_price",
    oracle="""
    WITH w AS (
        SELECT o_orderpriority, o_totalprice AS v, CAST(1 AS BIGINT) * o_orderkey % 7 + 1 AS wt
        FROM orders
    ),
    c AS (
        SELECT o_orderpriority, v, wt,
               SUM(wt) OVER (PARTITION BY o_orderpriority ORDER BY v, wt
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(wt) OVER (PARTITION BY o_orderpriority) AS tw
        FROM w
    )
    SELECT o_orderpriority,
           MIN(v) FILTER (WHERE 2 * cw >= tw) AS weighted_median,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower type-1 estimate): first value whose cumulative
    weight reaches half the total — survey-weighted analytics where plain
    percentile ignores row importance. One window pass over each group;
    weights here are a deterministic key-derived stand-in. The (v, wt)
    window order makes the cumulative sum deterministic under value ties."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = o.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 7 + 1).cast("long").alias("wt"),
    )
    cum = W.partitionBy("o_orderpriority").orderBy("v", "wt").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot = W.partitionBy("o_orderpriority")
    c = w.select(
        "o_orderpriority",
        "v",
        F.sum("wt").over(cum).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias(
                "weighted_median"
            ),
            F.max("tw").alias("total_weight"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "embedding_dim_profile",
    oracle="""
    WITH d AS (
        SELECT CAST(u.i AS INT) - 1 AS dim,
               CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
        FROM embeddings
        CROSS JOIN UNNEST(range(1, len(embedding) + 1)) AS u(i)
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(x, 0.05), 6) AS p05,
           ROUND(quantile_cont(x, 0.5), 6) AS p50,
           ROUND(quantile_cont(x, 0.95), 6) AS p95,
           CAST(SUM(CASE WHEN abs(x) < 1e-6 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_zero
    FROM d GROUP BY dim ORDER BY dim
    """,
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile of the embedding column — the
    embedding-health diagnostic (dead dimensions, scale outliers, collapsed
    variance) run before trusting vectors for retrieval/clustering.
    posexplode is a row-local flatMap; the per-dimension aggregate is one
    shuffle keyed by dim (bounded by dimensionality, skew-free)."""
    emb = spread_input(load_table(spark, sf_dir, "embeddings"))
    d = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    return (
        d.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(x, 0.05)"), 6).alias("p05"),
            F.round(F.expr("percentile(x, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(x, 0.95)"), 6).alias("p95"),
            F.sum(F.when(F.abs("x") < 1e-6, 1).otherwise(0)).cast("long").alias("n_near_zero"),
        )
        .orderBy("dim")
    )


# --- exact ROC AUC (Mann-Whitney rank form) ----------------------------------
# Model-evaluation primitive: the AUC of o_totalprice as a classifier score
# for "order contains a returned lineitem". Computed EXACTLY via the
# Mann-Whitney U identity with midrank tie handling — but formulated over
# the DISTINCT-SCORE histogram, not per-row ranks: group rows by score into
# (pos, neg) counts, cumulative negatives below each score via one window,
# then 2*U = sum(pos_s * (2*neg_below_s + neg_s)). All integer arithmetic,
# so the result is bit-identical across engines and partition orders.
#
# Scale: the per-score histogram collapses 100 TB of rows to |distinct
# scores| groups before any windowing; the cumulative window over that
# (unpartitioned) table is the one scale caveat — beyond ~10^8 distinct
# scores, swap it for the range-partition + broadcast-offset two-phase
# cumsum used by operators/scale.py::dense_ids. The label anti/semi side is
# an aggregated distinct-orderkey set, equi-joined (never nested-loop).
@query(
    "roc_auc_price_returns",
    oracle="""
    WITH ret AS (
        SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    lab AS (
        SELECT o.o_totalprice AS score,
               CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS y
        FROM orders o LEFT JOIN ret r ON r.l_orderkey = o.o_orderkey
    ),
    g AS (
        SELECT score,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
        FROM lab GROUP BY score
    ),
    c AS (
        SELECT pos, neg,
               CAST(COALESCE(SUM(neg) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS neg_below
        FROM g
    ),
    s AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(neg) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (2 * neg_below + neg)) AS BIGINT) AS num2
        FROM c
    )
    SELECT n_pos, n_neg,
           ROUND(CAST(num2 AS DOUBLE)
                 / CAST(NULLIF(2 * n_pos * n_neg, 0) AS DOUBLE), 6)
               AS auc
    FROM s
    """,
)
def roc_auc_price_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    lab = orders.join(
        ret, orders["o_orderkey"] == ret["l_orderkey"], "left"
    ).select(
        F.col("o_totalprice").alias("score"),
        F.when(F.col("l_orderkey").isNotNull(), 1).otherwise(0).alias("y"),
    )
    g = lab.groupBy("score").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    c = g.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("long").alias("neg_below"),
    )
    s = c.groupBy().agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("neg_below") + F.col("neg")))
        .cast("long")
        .alias("num2"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        # one empty class => AUC undefined BY CONSTRUCTION on both engines
        F.round(
            F.col("num2").cast("double")
            / F.nullif(
                (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("auc"),
    )


@query(
    "ks_test_click_purchase",
    oracle="""
    WITH ev AS (
        SELECT event_type, "value" AS v FROM events
        WHERE event_type IN ('click', 'purchase') AND "value" IS NOT NULL
    ),
    g AS (
        SELECT v,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM ev GROUP BY v
    ),
    c AS (
        SELECT v,
               CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cum2
        FROM g
    ),
    t AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM g
    ),
    d AS (
        SELECT c.v, t.n1, t.n2,
               ABS(c.cum1 * t.n2 - c.cum2 * t.n1) AS d_num
        FROM c, t
    ),
    r AS (
        SELECT v, n1, n2, d_num,
               ROW_NUMBER() OVER (ORDER BY d_num DESC, v ASC) AS rn
        FROM d
    )
    SELECT n1, n2,
           ROUND(CAST(d_num AS DOUBLE)
                 / CAST(NULLIF(n1 * n2, 0) AS DOUBLE), 6) AS ks_d,
           v AS at_value,
           ROUND(SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      / CAST(n1 + n2 AS DOUBLE))
                 * (CAST(d_num AS DOUBLE)
                    / CAST(NULLIF(n1 * n2, 0) AS DOUBLE)), 6)
               AS ks_lambda
    FROM r WHERE rn = 1
    """,
)
def ks_test_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the `value`
    distributions of two event types (the distribution-shift companion to
    `psi_source_drift` / `source_token_kl`, sensitive to ANY CDF divergence,
    not just binned mass).

    Scale shape: one hash aggregation collapses the corpus to its distinct
    values (bounded by value cardinality, not row count), then one window
    pass over that bounded frame builds both empirical CDFs. The supremum
    comparison |F1-F2| runs entirely in BIGINTs (|cum1*n2 - cum2*n1|), so
    the argmax cannot drift across engines; the single division and the
    correctly-rounded sqrt for the scaled lambda statistic happen once on
    the 1-row result. At 100 TB the distinct-value frame is the only
    windowed data — for truly continuous doubles (distinct ~ rows) the
    documented fallback is quantile-sketch pre-binning, a weaker check.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    g = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    c = g.select(
        "v",
        F.sum("c1").over(wc).cast("long").alias("cum1"),
        F.sum("c2").over(wc).cast("long").alias("cum2"),
    )
    tot = g.groupBy().agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = c.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias(
            "d_num"
        ),
    )
    r = d.withColumn(
        "rn",
        F.row_number().over(W.orderBy(F.col("d_num").desc(), F.col("v").asc())),
    ).filter(F.col("rn") == 1)
    # one sample empty (a corpus with only one of the two event types) =>
    # the two-sample statistic is undefined BY CONSTRUCTION on both engines
    ks_d = F.col("d_num").cast("double") / F.nullif(
        (F.col("n1") * F.col("n2")).cast("double"), F.lit(0.0)
    )
    return r.select(
        "n1",
        "n2",
        F.round(ks_d, 6).alias("ks_d"),
        F.col("v").alias("at_value"),
        F.round(
            F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2").cast("double")
                / (F.col("n1") + F.col("n2")).cast("double")
            )
            * ks_d,
            6,
        ).alias("ks_lambda"),
    )


@query(
    "lift_gains_price_returns",
    oracle="""
    WITH ret AS (
        SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    lab AS (
        SELECT o.o_orderkey, o.o_totalprice AS score,
               CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS y
        FROM orders o LEFT JOIN ret r ON r.l_orderkey = o.o_orderkey
    ),
    dec AS (
        SELECT y,
               NTILE(10) OVER (ORDER BY score DESC, o_orderkey ASC) AS decile
        FROM lab
    ),
    g AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM dec GROUP BY decile
    ),
    c AS (
        SELECT decile, n, pos,
               CAST(SUM(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
               CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
               CAST(SUM(pos) OVER () AS BIGINT) AS tot_pos,
               CAST(SUM(n) OVER () AS BIGINT) AS tot_n
        FROM g
    )
    SELECT decile, n, pos,
           ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
           ROUND(CAST(cum_pos AS DOUBLE)
                 / CAST(NULLIF(tot_pos, 0) AS DOUBLE), 6)
               AS cum_capture,
           ROUND((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
                 / NULLIF(CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE), 0),
                 6)
               AS cum_lift
    FROM c ORDER BY decile
    """,
)
def lift_gains_price_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table of the price->returns ranking (the campaign-
    targeting readout next to `roc_auc_price_returns`'s single number):
    per score decile the observed positive rate, cumulative capture of all
    positives, and cumulative lift over the base rate.

    The global NTILE is the one scale caveat: it orders the full scored
    population. At 100 TB the documented swap is pre-bucketing by quantile-
    sketch score boundaries (mergeable, one pass) — here the exact ntile
    keeps the oracle hash-checkable, with (score DESC, key ASC) pinning the
    tie order so decile boundaries cannot drift across engines. All counts
    stay BIGINT; rates divide once per output row (10 rows).
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    lab = orders.join(
        ret, orders["o_orderkey"] == ret["l_orderkey"], "left"
    ).select(
        "o_orderkey",
        F.col("o_totalprice").alias("score"),
        F.when(F.col("l_orderkey").isNotNull(), 1).otherwise(0).alias("y"),
    )
    dec = lab.select(
        "y",
        F.ntile(10)
        .over(W.orderBy(F.col("score").desc(), F.col("o_orderkey").asc()))
        .alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    wa = W.orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = g.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(wc).cast("long").alias("cum_pos"),
        F.sum("n").over(wc).cast("long").alias("cum_n"),
        F.sum("pos").over(wa).cast("long").alias("tot_pos"),
        F.sum("n").over(wa).cast("long").alias("tot_n"),
    )
    return c.select(
        "decile",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n").cast("double"), 6).alias(
            "pos_rate"
        ),
        # zero positives anywhere => capture/lift undefined BY CONSTRUCTION
        F.round(
            F.col("cum_pos").cast("double")
            / F.nullif(F.col("tot_pos").cast("double"), F.lit(0.0)),
            6,
        ).alias("cum_capture"),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("cum_n").cast("double"))
            / F.nullif(
                F.col("tot_pos").cast("double")
                / F.col("tot_n").cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")


# --- Kaplan-Meier survival estimator -----------------------------------------
# Time-to-first-purchase after signup with right censoring at the corpus
# horizon — the product-limit estimator computed as ONE distributed
# aggregation chain: per-user durations (two conditional-min aggs, the
# funnel idiom), a day-granular event/censor histogram, then n-at-risk and
# the survival product via cumulative windows over the BOUNDED duration
# frame. The product folds as exp(cumsum(ln(1 - d/n))) with each ln term
# floored to a 1e-12-scaled BIGINT (the KL idiom), so partial order cannot
# move a bit; day rows where the factor hits zero short-circuit to S=0 on
# both engines identically.
@query(
    "kaplan_meier_signup_purchase",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) AS tmax FROM events),
    per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events GROUP BY user_id
    ),
    cohort AS (
        SELECT u.user_id,
               CASE WHEN u.tp IS NOT NULL AND u.tp > u.t0
                    THEN CAST(FLOOR(CAST(epoch_us(u.tp) - epoch_us(u.t0)
                              AS DOUBLE) / 86400000000.0) AS BIGINT)
                    ELSE CAST(FLOOR(CAST(epoch_us(h.tmax) - epoch_us(u.t0)
                              AS DOUBLE) / 86400000000.0) AS BIGINT)
               END AS dur,
               CASE WHEN u.tp IS NOT NULL AND u.tp > u.t0 THEN 1 ELSE 0
               END AS ev
        FROM per_user u, horizon h WHERE u.t0 IS NOT NULL
    ),
    hist AS (
        SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_events,
               CAST(SUM(1 - ev) AS BIGINT) AS d_censored
        FROM cohort GROUP BY dur
    ),
    risk AS (
        SELECT dur, d_events, d_censored,
               CAST(SUM(d_events + d_censored) OVER () AS BIGINT)
                   - CAST(COALESCE(SUM(d_events + d_censored) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS n_risk
        FROM hist
    ),
    terms AS (
        SELECT dur, d_events, d_censored, n_risk,
               CASE WHEN d_events >= n_risk THEN NULL
                    ELSE CAST(FLOOR(ln(1.0 - CAST(d_events AS DOUBLE)
                         / CAST(n_risk AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
               END AS lnterm,
               CAST(SUM(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
                    OVER (ORDER BY dur) AS BIGINT) AS dead
        FROM risk
    )
    SELECT dur AS day, d_events, d_censored, n_risk,
           CASE WHEN dead > 0 THEN 0.0
                ELSE ROUND(exp((CAST(SUM(lnterm) OVER (ORDER BY dur)
                     AS DOUBLE)) / 1e12), 6)
           END AS survival
    FROM terms
    WHERE d_events > 0
    ORDER BY day
    """,
)
def kaplan_meier_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("tmax"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
    )
    has_event = F.col("tp").isNotNull() & (F.col("tp") > F.col("t0"))
    cohort = (
        per_user.filter(F.col("t0").isNotNull())
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                has_event,
                F.floor(
                    (
                        F.unix_micros("tp") - F.unix_micros("t0")
                    ).cast("double")
                    / 86400000000.0
                ),
            )
            .otherwise(
                F.floor(
                    (
                        F.unix_micros("tmax") - F.unix_micros("t0")
                    ).cast("double")
                    / 86400000000.0
                )
            )
            .cast("long")
            .alias("dur"),
            F.when(has_event, 1).otherwise(0).alias("ev"),
        )
    )
    hist = cohort.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("d_censored"),
    )
    wall = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wprev = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    tot = F.col("d_events") + F.col("d_censored")
    risk = hist.select(
        "dur",
        "d_events",
        "d_censored",
        (
            F.sum(tot).over(wall).cast("long")
            - F.coalesce(F.sum(tot).over(wprev), F.lit(0)).cast("long")
        ).alias("n_risk"),
    )
    lnterm = F.when(
        F.col("d_events") >= F.col("n_risk"), F.lit(None)
    ).otherwise(
        F.floor(
            F.log(
                1.0
                - F.col("d_events").cast("double") / F.col("n_risk").cast("double")
            )
            * 1e12
            + F.lit(0.5)
        ).cast("long")
    )
    terms = risk.select(
        "dur",
        "d_events",
        "d_censored",
        "n_risk",
        lnterm.alias("lnterm"),
        F.sum(
            F.when(F.col("d_events") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(wcum)
        .cast("long")
        .alias("dead"),
    )
    return (
        terms.select(
            F.col("dur").alias("day"),
            "d_events",
            "d_censored",
            "n_risk",
            F.when(F.col("dead") > 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.exp(
                        F.sum("lnterm").over(wcum).cast("double") / 1e12
                    ),
                    6,
                )
            )
            .alias("survival"),
            F.col("d_events").alias("_de"),
        )
        .filter(F.col("_de") > 0)
        .drop("_de")
        .orderBy("day")
    )


# --- Spearman rank correlation (exact midranks) ------------------------------
# Tie-corrected Spearman rho WITHOUT a global per-row sort: midranks come
# from each column's DISTINCT-VALUE histogram (the AUC idiom) — cumulative
# counts over the bounded value frame give 2*midrank as an exact integer,
# broadcast-joined back to the fact rows. The five rank moments then fold
# in one map-side-partial aggregation (all BIGINT: with 2*rank <= 2n the
# squared sums stay under 2^63 to ~1e6 rows per... at 6e5 rows sf0.1 the
# largest moment is ~9e17; beyond ~7e5 rows stage through decimal or the
# two-phase dense_ids path), and rho's closed form evaluates on the 1-row
# result in identical double arithmetic.
@query(
    "spearman_price_qty",
    oracle="""
    WITH src AS (
        SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ),
    hx AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY x
    ),
    rx AS (
        SELECT x,
               2 * CAST(COALESCE(SUM(c) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) + c + 1 AS r2
        FROM hx
    ),
    hy AS (
        SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY y
    ),
    ry AS (
        SELECT y,
               2 * CAST(COALESCE(SUM(c) OVER (
                   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) + c + 1 AS r2
        FROM hy
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx.r2) AS BIGINT) AS sx,
               CAST(SUM(ry.r2) AS BIGINT) AS sy,
               CAST(SUM(rx.r2 * ry.r2) AS BIGINT) AS sxy,
               CAST(SUM(rx.r2 * rx.r2) AS BIGINT) AS sxx,
               CAST(SUM(ry.r2 * ry.r2) AS BIGINT) AS syy
        FROM src JOIN rx ON rx.x = src.x JOIN ry ON ry.y = src.y
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0), 6)
               AS rho_spearman
    FROM m
    """,
)
def spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    src = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )

    def midranks(col: str) -> DataFrame:
        h = src.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        wprev = W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        return h.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(wprev), F.lit(0)).cast("long")
                + F.col("c")
                + 1
            ).alias("r2"),
        )

    rx = midranks("x").withColumnRenamed("r2", "rx2")
    ry = midranks("y").withColumnRenamed("r2", "ry2")
    # rx (quantity) is genuinely tiny -> force broadcast; ry's histogram is
    # row-sized for a near-continuous column, so let AQE pick its strategy
    # (broadcast at test scale, shuffle join at corpus scale).
    m = (
        src.join(F.broadcast(rx), "x")
        .join(ry, "y")
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rx2").cast("long").alias("sx"),
            F.sum("ry2").cast("long").alias("sy"),
            F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
            F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
            F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    return m.select(
        "n",
        # a constant series (all ranks tied, e.g. a single row) has zero
        # rank variance: rho undefined BY CONSTRUCTION on both engines
        F.round(
            (nd * F.col("sxy").cast("double") - sxd * syd)
            / F.nullif(
                F.sqrt(
                    (nd * F.col("sxx").cast("double") - sxd * sxd)
                    * (nd * F.col("syy").cast("double") - syd * syd)
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("rho_spearman"),
    )


# --- split-conformal prediction intervals -------------------------------------
# Distribution-free uncertainty quantification for a regression: fit y~x on
# the 'fit' split, take q-hat = the ceil(0.9*(n+1))-th smallest |residual| on
# the 'calib' split, and the interval prediction +/- q-hat then covers >= 90%
# of 'test' rows by the exchangeability guarantee — no Gaussian assumption.
# Scale shape: entity-keyed md5 split (no RNG), ONE map-side-partial moment
# aggregation fits the model, and the conformal order statistic comes from
# the CENT-QUANTIZED residual histogram (distinct cent values are bounded by
# the price range, not the corpus) + a cumulative window — never a global
# per-row sort. Coverage is an exact BIGINT count. All doubles mirror the
# oracle's literal association order (cv_regression idiom).
@query(
    "conformal_interval_price",
    oracle="""
    WITH src AS (
        SELECT CASE
                   WHEN substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '80'
                       THEN 'fit'
                   WHEN substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < 'c0'
                       THEN 'calib'
                   ELSE 'test'
               END AS split,
               l_quantity AS x, l_extendedprice AS y
        FROM lineitem
    ),
    fm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(x * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(FLOOR(y * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(FLOOR(x * x * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sxx,
               CAST(SUM(CAST(FLOOR(x * y * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sxy
        FROM src WHERE split = 'fit'
    ),
    fit2 AS (
        SELECT n AS n_fit,
               (100.0 * CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / NULLIF(100.0 * CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS slope100,
               (CAST(sy AS DOUBLE) / 100.0
                - ((100.0 * CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / NULLIF(100.0 * CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
                  * (CAST(sx AS DOUBLE) / 100.0))
               / NULLIF(CAST(n AS DOUBLE), 0) AS intercept
        FROM fm
    ),
    calib AS (
        SELECT CAST(FLOOR(ABS(s.y - (f.intercept + f.slope100 * s.x)) * 100
                          + 0.5) AS BIGINT) AS r_s
        FROM src s, fit2 f WHERE s.split = 'calib'
    ),
    hist AS (SELECT r_s, CAST(COUNT(*) AS BIGINT) AS c FROM calib GROUP BY r_s),
    nc AS (SELECT CAST(SUM(c) AS BIGINT) AS n_calib FROM hist),
    cum AS (
        SELECT h.r_s, SUM(h.c) OVER (ORDER BY h.r_s) AS cum, n.n_calib,
               CAST(FLOOR((9.0 * (n.n_calib + 1) + 9) / 10) AS BIGINT) AS k
        FROM hist h, nc n
    ),
    q AS (
        SELECT MIN(r_s) AS qhat_s, MIN(n_calib) AS n_calib
        FROM cum WHERE cum >= LEAST(k, n_calib)
    ),
    tst AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN CAST(FLOOR(ABS(s.y - (f.intercept
                                  + f.slope100 * s.x)) * 100 + 0.5) AS BIGINT)
                                  <= q.qhat_s
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM src s, fit2 f, q WHERE s.split = 'test'
    )
    SELECT f.n_fit, q.n_calib, t.n_test,
           FLOOR(f.slope100 * 1e6 + 0.5) / 1e6 AS slope,
           FLOOR(f.intercept * 1e6 + 0.5) / 1e6 AS intercept,
           CAST(q.qhat_s AS DOUBLE) / 100 AS qhat,
           FLOOR(CAST(t.n_covered AS DOUBLE) / NULLIF(t.n_test, 0) * 1e6
                 + 0.5) / 1e6
               AS coverage
    FROM fit2 f, q, tst t
    """,
)
def conformal_interval_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    prefix = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2)
    # entity-keyed (whole orders stay in one split), deterministic:
    # ~50% fit / ~25% calib / ~25% test by hash range
    src = li.select(
        F.when(prefix < "80", "fit")
        .when(prefix < "c0", "calib")
        .otherwise("test")
        .alias("split"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    # NOT checkpointed: at 100 TB, materializing the corpus-sized projection
    # costs more than three pushed-down 3-column parquet scans (one per
    # split). The tiny 1-row fit/quantile frames below are checkpointed
    # instead, so each scan happens once.
    stage = lambda e, m: F.floor(e * m + F.lit(0.5)).cast("long")  # noqa: E731
    fm = src.filter(F.col("split") == "fit").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(stage(F.col("x"), 100)).cast("long").alias("sx"),
        F.sum(stage(F.col("y"), 100)).cast("long").alias("sy"),
        F.sum(stage(F.col("x") * F.col("x"), 100)).cast("long").alias("sxx"),
        F.sum(stage(F.col("x") * F.col("y"), 100)).cast("long").alias("sxy"),
    )
    dn = F.col("n").cast("double")
    dsx = F.col("sx").cast("double")
    dsy = F.col("sy").cast("double")
    dsxx = F.col("sxx").cast("double")
    dsxy = F.col("sxy").cast("double")
    # NULLIF: an empty or x-constant fit split (degenerate tiny corpora)
    # has no defined least-squares line — NULL on both engines
    slope = (F.lit(100.0) * dn * dsxy - dsx * dsy) / F.nullif(
        F.lit(100.0) * dn * dsxx - dsx * dsx, F.lit(0.0)
    )
    fit2 = fm.select(
        F.col("n").alias("n_fit"),
        slope.alias("slope100"),
        (
            (dsy / 100.0 - slope * (dsx / 100.0)) / F.nullif(dn, F.lit(0.0))
        ).alias("intercept"),
    ).localCheckpoint(eager=False)  # 1 row, three consumers: fit scan once
    resid_s = stage(
        F.abs(F.col("y") - (F.col("intercept") + F.col("slope100") * F.col("x"))),
        100,
    )
    calib = (
        src.filter(F.col("split") == "calib")
        .crossJoin(F.broadcast(fit2))
        .select(resid_s.alias("r_s"))
    )
    hist = calib.groupBy("r_s").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nc = hist.agg(F.sum("c").cast("long").alias("n_calib"))
    cum = hist.crossJoin(F.broadcast(nc)).select(
        "r_s",
        "n_calib",
        F.sum("c").over(W.orderBy("r_s")).alias("cum"),
        F.floor((F.lit(9.0) * (F.col("n_calib") + 1) + F.lit(9.0)) / F.lit(10.0))
        .cast("long")
        .alias("k"),
    )
    q = (
        cum.filter(F.col("cum") >= F.least(F.col("k"), F.col("n_calib")))
        .agg(F.min("r_s").alias("qhat_s"), F.min("n_calib").alias("n_calib"))
        .localCheckpoint(eager=False)  # 1 row, two consumers: calib scan once
    )
    covered = (resid_s <= F.col("qhat_s")).cast("int")
    tst = (
        src.filter(F.col("split") == "test")
        .crossJoin(F.broadcast(fit2))
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(covered).cast("long").alias("n_covered"),
        )
    )
    return (
        fit2.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(tst))
        .select(
            "n_fit",
            "n_calib",
            "n_test",
            (F.floor(F.col("slope100") * 1e6 + F.lit(0.5)) / 1e6).alias("slope"),
            (F.floor(F.col("intercept") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "intercept"
            ),
            (F.col("qhat_s").cast("double") / 100).alias("qhat"),
            (
                F.floor(
                    F.col("n_covered").cast("double")
                    / F.nullif(F.col("n_test").cast("double"), F.lit(0.0))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("coverage"),
        )
    )


# --- reliability diagram + Brier decomposition --------------------------------
# The third leg of the calibration trio (conformal interval, isotonic fit,
# and THIS: is a probabilistic score calibrated?). Model: predict
# P(l_returnflag = 'R') per price decile from the train split; the
# reliability diagram compares that prediction against the eval split's
# observed rate per bin, with each bin's exact Brier contribution. Scale
# shape: one train pass for the 9 decile boundaries (exact interpolated
# percentile == DuckDB quantile_cont) + per-bin positive counts, one eval
# pass binned by the broadcast boundary row; every rate is one
# BIGINT/BIGINT -> double division and the Brier term mirrors the oracle's
# literal association order. The deciles come from TRAIN only — reusing eval
# quantiles would leak the evaluation distribution into the binning.
@query(
    "calibration_bins_returns",
    oracle="""
    WITH src AS (
        SELECT CASE WHEN substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < 'aa'
                    THEN 'train' ELSE 'eval' END AS split,
               l_extendedprice AS price,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    bounds AS (
        SELECT quantile_cont(price,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        FROM src WHERE split = 'train'
    ),
    binned AS (
        SELECT s.split, s.y,
               (CASE WHEN s.price > b.q[1] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[2] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[3] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[4] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[5] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[6] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[7] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[8] THEN 1 ELSE 0 END
                + CASE WHEN s.price > b.q[9] THEN 1 ELSE 0 END) AS bin
        FROM src s, bounds b
    ),
    tr AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_train,
               CAST(SUM(y) AS BIGINT) AS pos_train
        FROM binned WHERE split = 'train' GROUP BY bin
    ),
    ev AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(y) AS BIGINT) AS pos_eval
        FROM binned WHERE split = 'eval' GROUP BY bin
    ),
    j AS (
        SELECT t.bin, t.n_train, e.n_eval,
               CAST(t.pos_train AS DOUBLE) / t.n_train AS pred_rate,
               CAST(e.pos_eval AS DOUBLE) / e.n_eval AS obs_rate,
               e.pos_eval
        FROM tr t JOIN ev e ON e.bin = t.bin
    )
    SELECT bin, n_train, n_eval,
           FLOOR(pred_rate * 1e6 + 0.5) / 1e6 AS pred_rate,
           FLOOR(obs_rate * 1e6 + 0.5) / 1e6 AS obs_rate,
           FLOOR((pred_rate - obs_rate) * 1e6 + 0.5) / 1e6 AS gap,
           FLOOR((pred_rate * pred_rate * n_eval
                  - 2.0 * pred_rate * pos_eval + pos_eval)
                 / n_eval * 1e6 + 0.5) / 1e6 AS bin_brier
    FROM j ORDER BY bin
    """,
)
def calibration_bins_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    prefix = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2)
    src = li.select(
        F.when(prefix < "aa", "train").otherwise("eval").alias("split"),
        F.col("l_extendedprice").alias("price"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    bounds = (
        src.filter(F.col("split") == "train")
        .agg(
            F.expr(
                "percentile(price, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D,"
                " 0.6D, 0.7D, 0.8D, 0.9D))"
            ).alias("q")
        )
        .localCheckpoint(eager=False)  # 1 row, two split consumers
    )
    bin_col = sum(
        F.when(F.col("price") > F.element_at("q", i), 1).otherwise(0)
        for i in range(1, 10)
    ).alias("bin")
    binned = src.crossJoin(F.broadcast(bounds)).select("split", "y", bin_col)
    tr = (
        binned.filter(F.col("split") == "train")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.sum("y").cast("long").alias("pos_train"),
        )
    )
    ev = (
        binned.filter(F.col("split") == "eval")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum("y").cast("long").alias("pos_eval"),
        )
    )
    pred = (F.col("pos_train").cast("double") / F.col("n_train")).alias("pred_rate")
    obs = (F.col("pos_eval").cast("double") / F.col("n_eval")).alias("obs_rate")
    j = tr.join(ev, "bin").select(
        "bin", "n_train", "n_eval", pred, obs, "pos_eval"
    )
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return j.select(
        "bin",
        "n_train",
        "n_eval",
        r6(F.col("pred_rate")).alias("pred_rate"),
        r6(F.col("obs_rate")).alias("obs_rate"),
        r6(F.col("pred_rate") - F.col("obs_rate")).alias("gap"),
        r6(
            (
                F.col("pred_rate") * F.col("pred_rate") * F.col("n_eval")
                - F.lit(2.0) * F.col("pred_rate") * F.col("pos_eval")
                + F.col("pos_eval")
            )
            / F.col("n_eval")
        ).alias("bin_brier"),
    ).orderBy("bin")


@query(
    "cohens_kappa_quality_labels",
    oracle="""
    WITH lab AS (
        SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
               CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 40
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (a = 1 AND b = 1) AS BIGINT) AS n11,
               CAST(COUNT(*) FILTER (a = 1 AND b = 0) AS BIGINT) AS n10,
               CAST(COUNT(*) FILTER (a = 0 AND b = 1) AS BIGINT) AS n01,
               CAST(COUNT(*) FILTER (a = 0 AND b = 0) AS BIGINT) AS n00
        FROM lab
    )
    SELECT n, n11, n10, n01, n00,
           CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00)) AS DOUBLE)
           / NULLIF(n * n - ((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00)), 0) AS kappa
    FROM c
    """,
)
def cohens_kappa_quality_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document-quality raters
    (label A: n_chars >= 200; label B: token count >= 40) — the
    inter-annotator-agreement audit a labeling pipeline runs before
    trusting a cheap heuristic as a filter. One corpus pass folds the full
    2x2 contingency table map-side; kappa = (po - pe) / (1 - pe) is
    rearranged over the common denominator so the ONLY float op is a single
    division of two exact BIGINTs (bit-identical cross-engine by
    construction — no staged rounding needed). pe = 1 (degenerate constant
    raters) yields NULL via NULLIF, not a crash. Scale shape: map-side
    partial aggregation to one row; no shuffle wider than the 5-counter
    partials."""
    d = load_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= 200).cast("int")
    b = (F.size(tokens(F.col("text"))) >= 40).cast("int")
    lab = d.select(a.alias("a"), b.alias("b"))
    c = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 1), 1)).alias("n11"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 0), 1)).alias("n10"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 1), 1)).alias("n01"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 0), 1)).alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        (
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe_num).cast("double")
            / F.nullif(F.col("n") * F.col("n") - pe_num, F.lit(0))
        ).alias("kappa"),
    )


@query(
    "kendall_tau_daily",
    oracle="""
    WITH dy AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT CAST(COUNT(*) FILTER ((a.x - b.x) * (a.y - b.y) > 0) AS BIGINT) AS c,
               CAST(COUNT(*) FILTER ((a.x - b.x) * (a.y - b.y) < 0) AS BIGINT) AS d,
               CAST(COUNT(*) FILTER (a.x = b.x) AS BIGINT) AS tx,
               CAST(COUNT(*) FILTER (a.y = b.y) AS BIGINT) AS ty,
               CAST(COUNT(*) AS BIGINT) AS n0
        FROM dy a JOIN dy b ON a.d < b.d
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dy) AS n_days,
           n0 AS n_pairs, c AS concordant, d AS discordant,
           tx AS tied_x, ty AS tied_y,
           CAST(c - d AS DOUBLE)
           / NULLIF(sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)), 0) AS tau_b
    FROM p
    """,
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between two daily series (event
    volume vs distinct active users) — the tie-robust monotone-association
    companion to spearman_price_qty. Pair statistics (concordant,
    discordant, tied-in-x, tied-in-y) are EXACT BIGINT counts over the
    day-level self-join — bounded at days² pairs (the rollup collapses the
    corpus to one row per day first, so the quadratic stage is days-sized,
    never event-sized; at 100 TB this is a few thousand pairs). tau_b =
    (C - D) / sqrt((n0 - tx)(n0 - ty)) is two IEEE ops (sqrt, divide) over
    exact integers — bit-identical cross-engine; a constant series
    (denominator 0) yields NULL via NULLIF. The inequality join is a
    broadcast nested-loop over the days-sized frame by design (documented
    bounded cardinality, same rationale as gini's n² BIGINT staging)."""
    ev = load_table(spark, sf_dir, "events")
    dy = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("x"),
        F.countDistinct("user_id").alias("y"),
    )
    a = dy.select(F.col("d").alias("ad"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = dy.select(F.col("d").alias("bd"), F.col("x").alias("bx"), F.col("y").alias("by"))
    prod = (F.col("ax") - F.col("bx")) * (F.col("ay") - F.col("by"))
    p = (
        a.join(b, F.col("ad") < F.col("bd"))
        .agg(
            F.count(F.when(prod > 0, 1)).alias("c"),
            F.count(F.when(prod < 0, 1)).alias("d"),
            F.count(F.when(F.col("ax") == F.col("bx"), 1)).alias("tx"),
            F.count(F.when(F.col("ay") == F.col("by"), 1)).alias("ty"),
            F.count(F.lit(1)).alias("n0"),
        )
    )
    n_days = dy.agg(F.count(F.lit(1)).alias("n_days"))
    return p.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("tied_x"),
        F.col("ty").alias("tied_y"),
        (
            (F.col("c") - F.col("d")).cast("double")
            / F.nullif(
                F.sqrt(((F.col("n0") - F.col("tx")) * (F.col("n0") - F.col("ty"))).cast("double")),
                F.lit(0.0),
            )
        ).alias("tau_b"),
    )


# --- delete-one-group jackknife ------------------------------------------------
# The variance estimator for ratio metrics that have no closed-form SE —
# revenue-per-order, cost-per-click, sessions-per-user. Resampling ROWS at
# 100 TB is hopeless; the delete-one-GROUP jackknife (days here; shards or
# cookie-buckets in production) needs only one bounded frame of per-group
# partials: every leave-one-out estimate is (total - group)/(total - group),
# pure algebra on exact BIGINTs. This is the mechanism behind per-bucket
# jackknife CIs in large experimentation platforms.


@query(
    "jackknife_day_ratio",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS s_cents,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT SUM(s_cents) AS s_tot, SUM(n) AS n_tot, COUNT(*) AS g
        FROM daily
    ),
    loo AS (
        SELECT ((t.s_tot - d.s_cents) / 100.0) / (t.n_tot - d.n)
                   AS theta_i
        FROM daily d, tot t
        WHERE t.n_tot > d.n
    ),
    bar AS (
        SELECT COUNT(*) AS g,
               (SUM(CAST(FLOOR(theta_i * 1000000 + 0.5) AS BIGINT))
                / 1000000.0) / COUNT(*) AS theta_bar
        FROM loo
    )
    SELECT CAST(b.g AS BIGINT) AS g_days,
           (t.s_tot / 100.0) / t.n_tot AS theta_full,
           b.theta_bar,
           -- a single day (g = 0 leave-one-out estimates) leaves the
           -- jackknife variance undefined BY CONSTRUCTION on both engines,
           -- never a div-by-zero failure
           CASE WHEN b.g > 0 THEN
             (CAST(b.g - 1 AS DOUBLE) / b.g)
               * (SELECT SUM(CAST(FLOOR((l.theta_i - b2.theta_bar)
                                        * (l.theta_i - b2.theta_bar)
                                        * 100000000 + 0.5) AS BIGINT))
                         / 100000000.0
                  FROM loo l, bar b2)
           END AS jk_var,
           CASE WHEN b.g > 0 THEN
             SQRT((CAST(b.g - 1 AS DOUBLE) / b.g)
               * (SELECT SUM(CAST(FLOOR((l.theta_i - b2.theta_bar)
                                        * (l.theta_i - b2.theta_bar)
                                        * 100000000 + 0.5) AS BIGINT))
                         / 100000000.0
                  FROM loo l, bar b2))
           END AS jk_se
    FROM bar b, tot t
    """,
)
def jackknife_day_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-day jackknife SE for the revenue-per-order ratio.

    One corpus pass builds per-day exact partials (cents as BIGINT, order
    counts); totals broadcast back and every leave-one-out estimate
    theta_i = (S - s_i)/(N - n_i) is exact-integer algebra divided once in
    double. theta_bar and the squared deviations stage through scaled longs
    (floor(x*10^s + 0.5)) so partial-aggregation order cannot perturb the
    variance; jk_se is a correctly-rounded IEEE sqrt on both engines. The
    frame that crosses the cluster is days-sized, never rows-sized — swap
    days for 1000 cookie-buckets and this is the standard experimentation
    platform CI at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("s_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        # days-sized; 4 downstream consumers (tot, loo, bar, dev) — without
        # this the orders scan repeats once per crossJoin branch
        .localCheckpoint(eager=False)
    )
    tot = daily.agg(
        F.sum("s_cents").alias("s_tot"),
        F.sum("n").alias("n_tot"),
    )
    loo = (
        daily.crossJoin(F.broadcast(tot))
        .where(F.col("n_tot") > F.col("n"))
        .select(
            (
                ((F.col("s_tot") - F.col("s_cents")) / F.lit(100.0))
                / (F.col("n_tot") - F.col("n"))
            ).alias("theta_i"),
        )
    )
    bar = loo.agg(
        F.count(F.lit(1)).alias("g"),
        # guarded so an empty leave-one-out set (single day) yields NULL on
        # both engines instead of an ANSI divide-by-zero
        F.when(
            F.count(F.lit(1)) > 0,
            (
                F.sum(
                    F.floor(F.col("theta_i") * 1000000 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                / F.lit(1000000.0)
            )
            / F.count(F.lit(1)),
        ).alias("theta_bar"),
    )
    dev = (
        loo.crossJoin(F.broadcast(bar.select("g", "theta_bar")))
        .select(
            F.floor(
                (F.col("theta_i") - F.col("theta_bar"))
                * (F.col("theta_i") - F.col("theta_bar"))
                * 100000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dev2"),
        )
        .agg((F.sum("dev2") / F.lit(100000000.0)).alias("ss"))
    )
    # g = 0 (single day: no leave-one-out estimates) => variance undefined
    # BY CONSTRUCTION; theta_full still reports from the full-sample totals
    var = F.when(
        F.col("g") > 0,
        (F.col("g") - 1).cast("double") / F.col("g") * F.col("ss"),
    )
    return (
        tot.crossJoin(F.broadcast(bar))
        .crossJoin(F.broadcast(dev))
        .select(
            F.col("g").cast("long").alias("g_days"),
            ((F.col("s_tot") / F.lit(100.0)) / F.col("n_tot")).alias(
                "theta_full"
            ),
            F.col("theta_bar"),
            var.alias("jk_var"),
            F.sqrt(var).alias("jk_se"),
        )
    )


# --- Mann-Kendall trend test ----------------------------------------------------
# The significance companion to theilsen_daily_trend (same series, same
# days-bounded pair space): S = sum of pairwise signs against time order,
# tie-corrected variance, and the continuity-corrected z. Monotone-trend
# detection with NO distributional assumption — the standard pre-gate before
# trusting a fitted slope on telemetry that may be flat.


@query(
    "mann_kendall_daily",
    oracle="""
    WITH d AS (
        SELECT date_trunc('day', ts) AS dt,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / COUNT(value) AS x
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM d a JOIN d b ON a.dt < b.dt
    ),
    nn AS (SELECT COUNT(*) AS n FROM d),
    ties AS (
        SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
        FROM (SELECT COUNT(*) AS t FROM d GROUP BY x) g WHERE t > 1
    )
    SELECT nn.n AS n_days,
           s.s_stat,
           (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) / 18.0
               AS var_s,
           CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                     / SQRT((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - ties.tie_term) / 18.0)
                WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                     / SQRT((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - ties.tie_term) / 18.0)
                ELSE 0.0 END AS z
    FROM s, nn, ties
    """,
)
def mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S, tie-corrected variance and continuity-corrected z
    over the daily mean-value series.

    The daily means are exact staged doubles (identical both engines), so
    pairwise sign comparisons and tie-grouping by exact equality are
    deterministic; S and the tie term are pure BIGINT folds over the
    days-sized frame (days² pairs — a few thousand at any corpus size,
    because the rollup collapses rows first). One division and one IEEE
    sqrt produce var_s and z.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("dt"))
        .agg(
            (
                (
                    F.sum(
                        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast(
                            "long"
                        )
                    )
                    / F.lit(1000000.0)
                )
                / F.count("value")
            ).alias("x")
        )
        .localCheckpoint(eager=False)  # 3 consumers of the days-sized frame
    )
    a = d.select(F.col("dt").alias("ad"), F.col("x").alias("ax"))
    b = d.select(F.col("dt").alias("bd"), F.col("x").alias("bx"))
    s = a.join(b, F.col("ad") < F.col("bd")).agg(
        F.sum(
            F.when(F.col("bx") > F.col("ax"), 1)
            .when(F.col("bx") < F.col("ax"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            var_s.alias("var_s"),
            z.alias("z"),
        )
    )


# --- median-of-means ------------------------------------------------------------
# The heavy-tail-robust mean estimator with distributed structure built in:
# hash rows into k buckets, take each bucket's exact mean, report the MEDIAN
# of the bucket means. One map-side-partial aggregation to k rows, one exact
# interpolated percentile over k values — sub-Gaussian concentration under
# heavy tails where the plain mean is dominated by outliers, at the cost of
# one tiny extra stage. Bucketing is md5-derived, so membership is
# partition- and engine-proof.


@query(
    "median_of_means_value",
    oracle="""
    WITH b AS (
        SELECT CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || 'mom'),
                    1, 15) AS BIGINT) % 32 AS bucket,
               value
        FROM events WHERE value IS NOT NULL
    ),
    means AS (
        SELECT bucket,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                   / COUNT(*) AS m,
               COUNT(*) AS n
        FROM b GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MIN(n) AS BIGINT) AS min_bucket_n,
           ROUND(quantile_cont(m, 0.5), 6) AS median_of_means,
           ROUND((SUM(CAST(FLOOR(m * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                 / COUNT(*), 6) AS mean_of_means
    FROM means
    """,
)
def median_of_means_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means for the event value: 32 md5 buckets, exact bucket
    means (staged-long sums), exact interpolated median over the 32 means.
    The plain mean rides along (mean_of_means == plain mean up to bucket
    rounding) so the robust-vs-naive gap is visible in one row. Scale
    shape: everything after the first rollup is 32 rows."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bucket = md5_int(F.concat(F.col("event_id").cast("string"), F.lit("mom"))) % 32
    means = ev.groupBy(bucket.alias("bucket")).agg(
        (
            (
                F.sum(
                    F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
                )
                / F.lit(1000000.0)
            )
            / F.count(F.lit(1))
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    return means.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("n").cast("long").alias("min_bucket_n"),
        F.round(F.expr("percentile(m, 0.5)"), 6).alias("median_of_means"),
        F.round(
            (
                F.sum(F.floor(F.col("m") * 1000000 + F.lit(0.5)).cast("long"))
                / F.lit(1000000.0)
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_of_means"),
    )

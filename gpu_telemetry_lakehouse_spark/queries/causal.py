"""Observational causal-inference readouts: difference-in-differences and
coarsened exact matching (CEM).

The experimentation-platform queries that DON'T have a randomized assignment
to lean on: a rollout hit one cohort and not another (DiD), or treatment
correlates with pre-period behavior and the comparison must be re-balanced
(CEM, Iacus-King-Porro 2012). Both are aggregation-native — DiD is one
conditional-aggregation pass; CEM is a user rollup, a cell rollup, and
cells-sized weight algebra — so they run at any scale without per-row
modeling. The companion to the randomized-readout family
(`ab_experiment_readout`, `cuped_experiment_readout`).

Cohorts and the pre/post boundary are deterministic (user_id mod 3; the
events midpoint 2024-01-16, the same boundary `cuped_experiment_readout`
uses), so both engines compute identical cohorts. All means divide exact
scaled-BIGINT sums once; cross-cell folds stage through scaled longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_CUT = "2024-01-16"


@query(
    "did_readout",
    oracle=f"""
    WITH cells AS (
        SELECT CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN ts >= TIMESTAMP '{_CUT}' THEN 1 ELSE 0 END AS post,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS s
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT
          MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t_pre,
          MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t_post,
          MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c_pre,
          MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c_post,
          (MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) / 10000.0)
            / MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS m_t_pre,
          (MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) / 10000.0)
            / MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS m_t_post,
          (MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) / 10000.0)
            / MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS m_c_pre,
          (MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) / 10000.0)
            / MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS m_c_post
        FROM cells
    )
    SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre,
           CAST(n_t_post AS BIGINT) AS n_t_post,
           CAST(n_c_pre AS BIGINT) AS n_c_pre,
           CAST(n_c_post AS BIGINT) AS n_c_post,
           m_t_pre, m_t_post, m_c_pre, m_c_post,
           (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
    FROM p
    """,
)
def did_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort, two-period difference-in-differences on event values.

    The 2x2 of exact cell aggregates in ONE map-side-partial pass (cents-
    scaled BIGINT sums, one double division per cell mean); the DiD
    estimate is three IEEE subtractions of deterministic doubles. The
    parallel-trends contrast that survives any scale — the frame that
    crosses the cluster is 4 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("treated"),
        F.when(F.col("ts") >= F.lit(_CUT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
        ).alias("s"),
    )

    def cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    def mean(t: int, p: int):
        return (cell(t, p, "s") / F.lit(10000.0)) / cell(t, p, "n")

    piv = cells.agg(
        cell(1, 0, "n").cast("long").alias("n_t_pre"),
        cell(1, 1, "n").cast("long").alias("n_t_post"),
        cell(0, 0, "n").cast("long").alias("n_c_pre"),
        cell(0, 1, "n").cast("long").alias("n_c_post"),
        mean(1, 0).alias("m_t_pre"),
        mean(1, 1).alias("m_t_post"),
        mean(0, 0).alias("m_c_pre"),
        mean(0, 1).alias("m_c_post"),
    )
    return piv.select(
        "*",
        (
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre"))
        ).alias("did"),
    )


# --- coarsened exact matching -------------------------------------------------
# Per-user pre-period covariates are COARSENED into fixed cells (fixed-width
# cuts, not data-driven quantiles — the point of CEM is that the analyst
# names the resolution); cells containing both cohorts are "matched",
# everything else is pruned, and controls are reweighted to the treated cell
# distribution: ATT = mean_T(y) − Σ_s (m_T_s / M_T) · mean_C_s(y).


@query(
    "cem_att_readout",
    oracle=f"""
    WITH users AS (
        SELECT user_id,
               CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS treated,
               COUNT(CASE WHEN ts < TIMESTAMP '{_CUT}' THEN 1 END) AS pre_n,
               SUM(CASE WHEN ts < TIMESTAMP '{_CUT}'
                        THEN CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)
                        ELSE 0 END) AS pre_s,
               COUNT(CASE WHEN ts >= TIMESTAMP '{_CUT}' THEN 1 END) AS post_n,
               SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}'
                        THEN CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)
                        ELSE 0 END) AS post_s
        FROM events GROUP BY 1
    ),
    scored AS (
        SELECT treated,
               CASE WHEN pre_n < 40 THEN 0
                    WHEN pre_n < 80 THEN 1 ELSE 2 END AS c_act,
               LEAST(CAST(FLOOR(((pre_s / 10000.0) / pre_n) / 20) AS INT), 4)
                   AS c_val,
               CAST(FLOOR(((post_s / 10000.0) / post_n) * 1000000 + 0.5)
                    AS BIGINT) AS y6
        FROM users WHERE pre_n > 0 AND post_n > 0
    ),
    cells AS (
        SELECT c_act, c_val,
               SUM(treated) AS m_t,
               COUNT(*) - SUM(treated) AS m_c,
               SUM(CASE WHEN treated = 1 THEN y6 ELSE 0 END) AS s_t,
               SUM(CASE WHEN treated = 0 THEN y6 ELSE 0 END) AS s_c
        FROM scored GROUP BY 1, 2
    ),
    agg AS (
        SELECT COUNT(*) AS n_cells,
               SUM(CASE WHEN m_t > 0 AND m_c > 0 THEN 1 ELSE 0 END)
                   AS n_matched_cells,
               SUM(CASE WHEN m_t > 0 AND m_c > 0 THEN m_t ELSE 0 END) AS mt,
               SUM(CASE WHEN m_t > 0 AND m_c > 0 THEN m_c ELSE 0 END) AS mc,
               SUM(CASE WHEN NOT (m_t > 0 AND m_c > 0)
                        THEN m_t + m_c ELSE 0 END) AS n_pruned,
               SUM(CASE WHEN m_t > 0 AND m_c > 0 THEN s_t ELSE 0 END) AS st,
               SUM(CASE WHEN m_t > 0 AND m_c > 0
                        THEN CAST(FLOOR(CAST(m_t AS DOUBLE) * s_c / m_c
                                        * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS ctrl_term
        FROM cells
    )
    SELECT CAST(n_cells AS BIGINT) AS n_cells,
           CAST(n_matched_cells AS BIGINT) AS n_matched_cells,
           CAST(mt AS BIGINT) AS n_treated_matched,
           CAST(mc AS BIGINT) AS n_control_matched,
           CAST(n_pruned AS BIGINT) AS n_users_pruned,
           -- an empty matched set (mt = 0) leaves the ATT undefined BY
           -- CONSTRUCTION on both engines, never a div-by-zero failure
           CASE WHEN mt > 0 THEN (st / 1000000.0) / mt END AS y_treated,
           CASE WHEN mt > 0 THEN ((ctrl_term / 100.0) / 1000000.0) / mt
           END AS y_control_weighted,
           CASE WHEN mt > 0 THEN
             (st / 1000000.0) / mt
               - ((ctrl_term / 100.0) / 1000000.0) / mt
           END AS att
    FROM agg
    """,
)
def cem_att_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened-exact-matching ATT of treatment on post-period event value.

    Users roll up to pre-period covariates (activity count, mean value) and
    a post-period outcome; covariates coarsen into FIXED cells (the CEM
    contract — analyst-named resolution, identical literals both engines);
    unmatched cells prune; matched controls reweight to the treated cell
    distribution: ATT = mean_T(y) − Σ_s (m_T_s/M_T)·mean_C_s(y). The
    outcome is integer-staged ONCE per user (y6), so every later fold is
    exact BIGINT algebra except the per-cell control term m_t·s_c/m_c (one
    IEEE multiply-divide, re-staged before the cross-cell sum). Pipeline is
    user rollup -> cells rollup -> one cells-sized fold: three shuffles,
    each strictly smaller, nothing rows-sized after the first.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    pre = F.col("ts") < F.lit(_CUT).cast("timestamp")
    users = ev.groupBy("user_id").agg(
        F.count(F.when(pre, 1)).alias("pre_n"),
        F.sum(F.when(pre, cents).otherwise(0)).alias("pre_s"),
        F.count(F.when(~pre, 1)).alias("post_n"),
        F.sum(F.when(~pre, cents).otherwise(0)).alias("post_s"),
    )
    scored = users.where((F.col("pre_n") > 0) & (F.col("post_n") > 0)).select(
        F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("treated"),
        F.when(F.col("pre_n") < 40, 0)
        .when(F.col("pre_n") < 80, 1)
        .otherwise(2)
        .alias("c_act"),
        F.least(
            F.floor(
                ((F.col("pre_s") / F.lit(10000.0)) / F.col("pre_n"))
                / F.lit(20)
            ).cast("int"),
            F.lit(4),
        ).alias("c_val"),
        F.floor(
            ((F.col("post_s") / F.lit(10000.0)) / F.col("post_n"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("y6"),
    )
    cells = scored.groupBy("c_act", "c_val").agg(
        F.sum("treated").alias("m_t"),
        (F.count(F.lit(1)) - F.sum("treated")).alias("m_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y6")).otherwise(0)).alias(
            "s_t"
        ),
        F.sum(F.when(F.col("treated") == 0, F.col("y6")).otherwise(0)).alias(
            "s_c"
        ),
    )
    matched = (F.col("m_t") > 0) & (F.col("m_c") > 0)
    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(F.when(matched, 1).otherwise(0))
        .cast("long")
        .alias("n_matched_cells"),
        F.sum(F.when(matched, F.col("m_t")).otherwise(0)).alias("mt"),
        F.sum(F.when(matched, F.col("m_c")).otherwise(0)).alias("mc"),
        F.sum(F.when(~matched, F.col("m_t") + F.col("m_c")).otherwise(0))
        .cast("long")
        .alias("n_users_pruned"),
        F.sum(F.when(matched, F.col("s_t")).otherwise(0)).alias("st"),
        F.sum(
            F.when(
                matched,
                F.floor(
                    F.col("m_t").cast("double")
                    * F.col("s_c")
                    / F.col("m_c")
                    * 100
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(0)
        ).alias("ctrl_term"),
    )
    # mt = 0 (no matched cells at all) => ATT undefined: explicit NULL on
    # both engines rather than an ANSI divide-by-zero failure
    has_t = F.col("mt") > 0
    y_t = F.when(has_t, (F.col("st") / F.lit(1000000.0)) / F.col("mt"))
    y_c = F.when(
        has_t,
        ((F.col("ctrl_term") / F.lit(100.0)) / F.lit(1000000.0))
        / F.col("mt"),
    )
    return agg.select(
        "n_cells",
        "n_matched_cells",
        F.col("mt").cast("long").alias("n_treated_matched"),
        F.col("mc").cast("long").alias("n_control_matched"),
        "n_users_pruned",
        y_t.alias("y_treated"),
        y_c.alias("y_control_weighted"),
        (y_t - y_c).alias("att"),
    )


# --- Cochran-Mantel-Haenszel -----------------------------------------------------
# The STRATIFIED 2x2 test: does treatment associate with conversion after
# controlling for a confounding stratum (weekday here; geography/platform in
# production)? Completes the readout family: randomized (ab/cuped),
# observational (did/cem), stratified (cmh). Everything is derived from one
# (stratum, treated, converted) cell aggregation; per-stratum E_i and var_i
# are rationals of exact BIGINT cell products divided ONCE each and staged
# through scaled longs before the cross-stratum fold.


@query(
    "cmh_stratified_readout",
    oracle="""
    WITH cells AS (
        SELECT isodow(ts) AS stratum,
               CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN value > 50 THEN 1 ELSE 0 END AS converted,
               COUNT(*) AS m
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    strata AS (
        SELECT stratum,
               SUM(CASE WHEN treated = 1 AND converted = 1 THEN m ELSE 0 END) AS a,
               SUM(CASE WHEN treated = 1 THEN m ELSE 0 END) AS r1,
               SUM(CASE WHEN treated = 0 THEN m ELSE 0 END) AS r2,
               SUM(CASE WHEN converted = 1 THEN m ELSE 0 END) AS c1,
               SUM(CASE WHEN converted = 0 THEN m ELSE 0 END) AS c2,
               SUM(m) AS n
        FROM cells GROUP BY stratum
    ),
    terms AS (
        SELECT stratum,
               CAST(FLOOR(CAST(a * n - r1 * c1 AS DOUBLE) / n
                          * 100000000 + 0.5) AS BIGINT) AS dev8,
               CAST(FLOOR(CAST(r1 AS DOUBLE) * r2 * c1 * c2
                          / (CAST(n AS DOUBLE) * n * (n - 1))
                          * 100000000 + 0.5) AS BIGINT) AS var8
        FROM strata WHERE n > 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           SUM(dev8) / 100000000.0 AS sum_dev,
           SUM(var8) / 100000000.0 AS sum_var,
           -- zero variance (all strata single-arm or constant) => the test
           -- statistic is undefined BY CONSTRUCTION on both engines, not a
           -- div-by-zero artifact one engine happens to tolerate
           CASE WHEN SUM(var8) > 0 THEN
             (ABS(SUM(dev8) / 100000000.0) - 0.5)
               * (ABS(SUM(dev8) / 100000000.0) - 0.5)
               / (SUM(var8) / 100000000.0)
           END AS cmh_chi2
    FROM terms
    """,
)
def cmh_stratified_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMH chi-square for treatment x conversion stratified by weekday.

    One map-side-partial cell rollup (stratum x treated x converted), a
    strata-sized pivot, then per-stratum deviation a_i - E_i and variance
    r1·r2·c1·c2 / (n²(n-1)) — each an exact-integer product divided once in
    double, staged to scaled longs so the cross-stratum sums are
    order-proof. The continuity-corrected chi2 is three IEEE ops at the
    end. Nothing after the first rollup exceeds strata-count rows.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cells = ev.groupBy(
        F.dayofweek("ts").alias("dow_raw"),
        F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("treated"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("converted"),
    ).agg(F.count(F.lit(1)).alias("m"))
    # Spark dayofweek is 1=Sunday..7=Saturday; DuckDB isodow is 1=Mon..7=Sun.
    # Convert Spark's to isodow so the stratum labels agree.
    cells = cells.select(
        F.when(F.col("dow_raw") == 1, 7)
        .otherwise(F.col("dow_raw") - 1)
        .alias("stratum"),
        "treated",
        "converted",
        "m",
    )
    strata = cells.groupBy("stratum").agg(
        # ELSE 0 (not NULL): a stratum with zero treated converters must
        # contribute its full (0 - E_i) deviation, not silently drop out of
        # sum_dev while still counting in n_strata (that NULL would bias the
        # CMH statistic toward zero exactly when treatment looks harmful in
        # a stratum — VERDICT r6 finding #1).
        F.sum(
            F.when(
                (F.col("treated") == 1) & (F.col("converted") == 1),
                F.col("m"),
            ).otherwise(0)
        ).alias("a"),
        F.sum(F.when(F.col("treated") == 1, F.col("m")).otherwise(0)).alias(
            "r1"
        ),
        F.sum(F.when(F.col("treated") == 0, F.col("m")).otherwise(0)).alias(
            "r2"
        ),
        F.sum(F.when(F.col("converted") == 1, F.col("m")).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("converted") == 0, F.col("m")).otherwise(0)).alias(
            "c2"
        ),
        F.sum("m").alias("n"),
    )
    terms = strata.where(F.col("n") > 1).select(
        F.floor(
            (F.col("a") * F.col("n") - F.col("r1") * F.col("c1")).cast(
                "double"
            )
            / F.col("n")
            * 100000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dev8"),
        F.floor(
            F.col("r1").cast("double")
            * F.col("r2")
            * F.col("c1")
            * F.col("c2")
            / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
            * 100000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("var8"),
    )
    sum_dev = F.sum("dev8") / F.lit(100000000.0)
    sum_var = F.sum("var8") / F.lit(100000000.0)
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        sum_dev.alias("sum_dev"),
        sum_var.alias("sum_var"),
        # explicit NULL when the pooled variance is zero (degenerate strata)
        # instead of an ANSI divide-by-zero failure
        F.when(
            sum_var > F.lit(0.0),
            (F.abs(sum_dev) - F.lit(0.5))
            * (F.abs(sum_dev) - F.lit(0.5))
            / sum_var,
        ).alias("cmh_chi2"),
    )

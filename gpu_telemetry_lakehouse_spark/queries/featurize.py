"""Feature-engineering / statistics depth: distributed PCA projection,
count-min sketch (exactly twinned in SQL), chi-square independence test,
and mutual information over bucketed features.

These extend the §2.2 stats/sketch surface: CMS is the third mergeable
sketch family next to HLL/theta/bitmap (point-frequency estimation with a
provable overcount-only error), and the chi2/MI pair is the feature-
association toolkit a training-data pipeline runs before selecting
conditioning columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum, md5_int
from .registry import query

# --- count-min sketch --------------------------------------------------------
# d=3 rows x w=64 buckets, md5-derived hash per row. The sketch itself is the
# 3x64 counter grid — constant space, mergeable by cell-wise addition, built
# in THREE tiny aggregations over the stream (each map-side combinable to 64
# partials per task). Point estimate = min over rows of the key's bucket
# counter; CMS guarantees est >= true and E[overcount] <= N/w. Both engines
# replay the identical md5 bucketing, so the estimate is exactly oracle-
# twinnable — rare for a sketch, and exactly why CMS (deterministic hashing,
# no RNG) was picked over e.g. sampling-based frequency estimators.
_CMS_D = 3
_CMS_W = 64


def _bucket_sql(i: int) -> str:
    return (
        f"CAST('0x' || substring(md5('{i}:' || event_type), 1, 15) AS BIGINT)"
        f" % {_CMS_W}"
    )


@query(
    "cms_event_counts",
    oracle=f"""
    WITH g0 AS (
        SELECT {_bucket_sql(0)} AS b, COUNT(*) AS c FROM events GROUP BY 1
    ),
    g1 AS (
        SELECT {_bucket_sql(1)} AS b, COUNT(*) AS c FROM events GROUP BY 1
    ),
    g2 AS (
        SELECT {_bucket_sql(2)} AS b, COUNT(*) AS c FROM events GROUP BY 1
    ),
    keys AS (
        SELECT event_type,
               COUNT(*) AS exact_n,
               {_bucket_sql(0)} AS b0,
               {_bucket_sql(1)} AS b1,
               {_bucket_sql(2)} AS b2
        FROM events GROUP BY event_type
    )
    SELECT k.event_type, k.exact_n,
           LEAST(g0.c, g1.c, g2.c) AS cms_est,
           LEAST(g0.c, g1.c, g2.c) - k.exact_n AS overcount
    FROM keys k
    JOIN g0 ON g0.b = k.b0
    JOIN g1 ON g1.b = k.b1
    JOIN g2 ON g2.b = k.b2
    """,
)
def cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def bucket(i: int) -> F.Column:
        return md5_int(F.concat(F.lit(f"{i}:"), F.col("event_type"))) % _CMS_W

    grids = [
        ev.groupBy(bucket(i).alias(f"b{i}")).agg(F.count(F.lit(1)).alias(f"c{i}"))
        for i in range(_CMS_D)
    ]
    keys = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    keys = keys.select(
        "event_type",
        "exact_n",
        *[bucket(i).alias(f"b{i}") for i in range(_CMS_D)],
    )
    out = keys
    for i, g in enumerate(grids):
        out = out.join(F.broadcast(g), f"b{i}")
    est = F.least(*[F.col(f"c{i}") for i in range(_CMS_D)])
    return out.select(
        "event_type",
        "exact_n",
        est.alias("cms_est"),
        (est - F.col("exact_n")).alias("overcount"),
    )


# --- chi-square test of independence ----------------------------------------
# event_type x weekday contingency: chi2 = sum (obs - exp)^2 / exp with
# exp = row_total * col_total / N, plus Cramer's V. Everything reduces to
# ONE count aggregation over the stream; margins and N are tiny broadcast
# joins back onto the (|types| x 7)-cell table. Exact determinism: counts
# are integers, each cell's statistic is a pure double function of them,
# and the final sum runs through scaled longs.
@query(
    "chi2_event_weekday",
    oracle="""
    WITH cell AS (
        SELECT event_type, dayofweek(ts) AS wd, COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ),
    rowm AS (SELECT event_type, SUM(o) AS rt FROM cell GROUP BY 1),
    colm AS (SELECT wd, SUM(o) AS ct FROM cell GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM cell),
    terms AS (
        SELECT (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                   AS term,
               n
        FROM cell JOIN rowm USING (event_type) JOIN colm USING (wd)
        CROSS JOIN tot
    ),
    dims AS (
        SELECT (SELECT COUNT(*) FROM rowm) AS r, (SELECT COUNT(*) FROM colm) AS c
    )
    SELECT CAST(SUM(CAST(floor(term * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS chi2,
           CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
           round(sqrt((CAST(SUM(CAST(floor(term * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                       / 1000000.0)
                      / (CAST(MAX(n) AS DOUBLE)
                         * CAST(NULLIF(LEAST(d.r - 1, d.c - 1), 0) AS DOUBLE))),
                 6) AS cramers_v
    FROM terms CROSS JOIN dims d
    GROUP BY d.r, d.c
    """,
)
def chi2_event_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("wd")
    ).agg(F.count(F.lit(1)).alias("o"))
    rowm = cell.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colm = cell.groupBy("wd").agg(F.sum("o").alias("ct"))
    tot = cell.groupBy().agg(F.sum("o").alias("n"))
    exp = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col(
        "n"
    ).cast("double")
    terms = (
        cell.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "wd")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("o").cast("double") - exp)
                * (F.col("o").cast("double") - exp)
                / exp
            ).alias("term"),
            "n",
        )
    )
    dims = rowm.groupBy().agg(F.count(F.lit(1)).alias("r")).crossJoin(
        colm.groupBy().agg(F.count(F.lit(1)).alias("c"))
    )
    chi2 = exact_sum("term", scale=6)
    return (
        terms.crossJoin(F.broadcast(dims))
        .groupBy("r", "c")
        .agg(
            chi2.alias("chi2"),
            F.max("n").alias("_n"),
        )
        .select(
            "chi2",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            # NULLIF: a 1xC or Rx1 table has zero Cramer's-V degrees of
            # freedom — NULL on both engines instead of an ANSI crash
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("_n").cast("double")
                        * F.nullif(
                            F.least(F.col("r") - 1, F.col("c") - 1), F.lit(0)
                        ).cast("double")
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# --- mutual information over bucketed features -------------------------------
# MI(event_type; value-quartile) in nats: sum p_xy * ln(p_xy / (p_x p_y)).
# The quartile bucket comes from an ntile over a TOTAL order (value, then
# event_id as the unique tie-break) so both engines assign identical buckets.
# Scale note: ntile over a global order is a single-partition sort — the
# scale path replaces it with approx-quantile range boundaries (one pass +
# broadcast thresholds); exactness is what the oracle gate needs here.
@query(
    "mutual_info_event_bucket",
    oracle="""
    WITH b AS (
        SELECT event_type,
               ntile(4) OVER (ORDER BY value, event_id) AS vq
        FROM events WHERE value IS NOT NULL
    ),
    cell AS (SELECT event_type, vq, COUNT(*) AS cxy FROM b GROUP BY 1, 2),
    mx AS (SELECT event_type, SUM(cxy) AS cx FROM cell GROUP BY 1),
    my AS (SELECT vq, SUM(cxy) AS cy FROM cell GROUP BY 1),
    tot AS (SELECT SUM(cxy) AS n FROM cell),
    terms AS (
        SELECT (CAST(cxy AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(cxy AS DOUBLE) * CAST(n AS DOUBLE)
                    / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) AS term
        FROM cell JOIN mx USING (event_type) JOIN my USING (vq)
        CROSS JOIN tot
    )
    SELECT CAST(SUM(CAST(floor(term * 1000000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000000.0 AS mi_nats
    FROM terms
    """,
)
def mutual_info_event_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # NULL values must not enter the ntile order: Spark sorts NULLS FIRST,
    # DuckDB NULLS LAST, so any NULL would shift every bucket differently
    # per engine (same defensive filter as the sibling inference queries)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        "event_type",
        F.ntile(4).over(W.orderBy("value", "event_id")).alias("vq"),
    )
    cell = b.groupBy("event_type", "vq").agg(F.count(F.lit(1)).alias("cxy"))
    mx = cell.groupBy("event_type").agg(F.sum("cxy").alias("cx"))
    my = cell.groupBy("vq").agg(F.sum("cxy").alias("cy"))
    tot = cell.groupBy().agg(F.sum("cxy").alias("n"))
    term = (F.col("cxy").cast("double") / F.col("n").cast("double")) * F.log(
        F.col("cxy").cast("double")
        * F.col("n").cast("double")
        / (F.col("cx").cast("double") * F.col("cy").cast("double"))
    )
    return (
        cell.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "vq")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term"))
        .groupBy()
        .agg(exact_sum("term", scale=9).alias("mi_nats"))
    )


# --- distributed PCA projection over a 2-feature slice -----------------------
# VERDICT r3 #7: rows-only -> oracle-twinned via the closed-form 2x2
# covariance eigenbasis. Over the (dim0, dim1) slice of the embeddings the
# principal axis of covariance [[a,c],[c,b]] is theta = atan2(2c, a-b)/2; we
# need only (cos theta, sin theta), which the half-angle identities give
# ALGEBRAICALLY: with d = a-b, r = sqrt(d^2 + 4c^2),
#   cos theta = sqrt((1 + d/r)/2),  sin theta = sign(c) * sqrt((1 - d/r)/2)
# (theta in (-pi/2, pi/2] so cos >= 0; the c = 0, d < 0 edge takes the +
# branch giving sin = 1, matching atan2(0, d<0)/2 = pi/2; r = 0 is the
# isotropic degenerate case pinned to the identity basis). Every op here is
# +,-,*,/,sqrt — all IEEE-754 correctly rounded and therefore BIT-IDENTICAL
# on the JVM and DuckDB's libm given the identical staged moments, unlike
# atan2/cos/sin which both runtimes only guarantee to 1-2 ulp (ADVICE r4: a
# 1-ulp theta flip could cross a FLOOR(x*1e4+0.5) boundary). The covariance
# moments go through scaled-long sums (products of |x|<=1 values staged at
# 1e12: each term <= 1e12, so BIGINT overflow past ~9.2e6 rows ->
# decimal(38,0) staging, the gini_customer_revenue convention); everything
# after the moments is the identical deterministic double expression on both
# engines. The FULL-dim eigh path (operators/linalg.py: mapInPandas Gram
# partials -> driver eigh -> row-local literal projection) remains
# numpy-parity-pinned in tests/test_linalg.py — this query certifies the
# distributed fit+project shape end-to-end against an oracle.
_PCA_M = "1000000000000"  # 1e12 staging for moments


def _pca2_theta_sql() -> str:
    return f"""
    moms AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(FLOOR(x * {_PCA_M} + 0.5) AS BIGINT)) / {_PCA_M}.0 AS sx,
               SUM(CAST(FLOOR(y * {_PCA_M} + 0.5) AS BIGINT)) / {_PCA_M}.0 AS sy,
               SUM(CAST(FLOOR(x * x * {_PCA_M} + 0.5) AS BIGINT)) / {_PCA_M}.0 AS sxx,
               SUM(CAST(FLOOR(y * y * {_PCA_M} + 0.5) AS BIGINT)) / {_PCA_M}.0 AS syy,
               SUM(CAST(FLOOR(x * y * {_PCA_M} + 0.5) AS BIGINT)) / {_PCA_M}.0 AS sxy
        FROM pts
    ),
    cov AS (
        SELECT n, sx / n AS mx, sy / n AS my,
               (sxx / n - (sx / n) * (sx / n))
                   - (syy / n - (sy / n) * (sy / n)) AS d,
               sxy / n - (sx / n) * (sy / n) AS c
        FROM moms
    ),
    pol AS (
        SELECT n, mx, my, d, c, sqrt(d * d + 4.0 * c * c) AS r FROM cov
    ),
    basis AS (
        SELECT n, mx, my,
               CASE WHEN r = 0 THEN 1.0
                    ELSE sqrt((1.0 + d / r) / 2.0) END AS ct,
               CASE WHEN r = 0 THEN 0.0
                    WHEN c < 0 THEN -sqrt((1.0 - d / r) / 2.0)
                    ELSE sqrt((1.0 - d / r) / 2.0) END AS st
        FROM pol
    )
    """


@query(
    "pca_project_2d",
    oracle=f"""
    WITH pts AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    {_pca2_theta_sql()}
    SELECT p.vec_id,
           CAST(FLOOR(((p.x - b.mx) * b.ct
                       + (p.y - b.my) * b.st) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS pc1,
           CAST(FLOOR((-(p.x - b.mx) * b.st
                       + (p.y - b.my) * b.ct) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS pc2
    FROM pts p CROSS JOIN basis b
    """,
)
def pca_project_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the (dim0, dim1) feature slice: exact staged covariance
    moments (one corpus aggregation), closed-form 2x2 eigenbasis, row-local
    projection of every vector onto (pc1, pc2). One scan + a 1-row broadcast
    — the corpus is never shuffled, the fitted state is bytes."""
    m = int(_PCA_M)
    emb = load_table(spark, sf_dir, "embeddings")
    # try_element_at: out-of-bounds -> NULL, exactly DuckDB's list-index
    # semantics — a short/empty (ragged) vector contributes NULL moments
    # and NULL projections in BOTH engines instead of an ANSI array-index
    # crash on ours alone (ragged-embedding corpus class, round 9)
    pts = emb.select(
        "vec_id",
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("x"),
        F.try_element_at("embedding", F.lit(2)).cast("double").alias("y"),
    )

    def stage(c):
        return F.sum(F.floor(c * m + F.lit(0.5)).cast("long")) / float(m)

    x, y = F.col("x"), F.col("y")
    moms = pts.agg(
        F.count(F.lit(1)).alias("n"),
        stage(x).alias("sx"),
        stage(y).alias("sy"),
        stage(x * x).alias("sxx"),
        stage(y * y).alias("syy"),
        stage(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    mx, my = F.col("sx") / n, F.col("sy") / n
    # Half-angle eigenbasis (see module comment): only +,-,*,/,sqrt — every
    # op correctly rounded, bit-identical to the DuckDB oracle expression.
    cov = moms.select(
        mx.alias("mx"),
        my.alias("my"),
        ((F.col("sxx") / n - mx * mx) - (F.col("syy") / n - my * my)).alias("d"),
        (F.col("sxy") / n - mx * my).alias("c"),
    )
    pol = cov.withColumn("r", F.sqrt(F.col("d") * F.col("d") + 4.0 * F.col("c") * F.col("c")))
    half_minus = F.sqrt((F.lit(1.0) - F.col("d") / F.col("r")) / 2.0)
    basis = pol.select(
        "mx",
        "my",
        F.when(F.col("r") == 0, F.lit(1.0))
        .otherwise(F.sqrt((F.lit(1.0) + F.col("d") / F.col("r")) / 2.0))
        .alias("ct"),
        F.when(F.col("r") == 0, F.lit(0.0))
        .when(F.col("c") < 0, -half_minus)
        .otherwise(half_minus)
        .alias("st"),
    )
    dx, dy = x - F.col("mx"), y - F.col("my")
    pc1 = dx * F.col("ct") + dy * F.col("st")
    pc2 = -dx * F.col("st") + dy * F.col("ct")

    def out4(c):
        return F.floor(c * 10000 + F.lit(0.5)).cast("long") / 10000.0

    return pts.crossJoin(F.broadcast(basis)).select(
        "vec_id", out4(pc1).alias("pc1"), out4(pc2).alias("pc2")
    )


# --- quantile normalization ----------------------------------------------------
# The feature-preprocessing transform that forces every source's value
# distribution onto ONE pooled shape (microarray heritage; in LLM-data work it
# re-scales per-source quality/length scores so a mixed-corpus threshold means
# the same thing in every source). Bin-granular form: rank within source ->
# 100 quantile bins -> the normalized value of a bin is the cross-source mean
# of that bin's per-source means.


@query(
    "quantile_normalize_lengths",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               ntile(100) OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS bin
        FROM documents
    ),
    src_bin AS (
        SELECT source, bin, COUNT(*) AS n,
               SUM(n_chars) AS s,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS m
        FROM ranked GROUP BY source, bin
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           (SUM(CAST(FLOOR(m * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / COUNT(*) AS qnorm_value,
           MIN(m) AS min_src_mean,
           MAX(m) AS max_src_mean
    FROM src_bin GROUP BY bin ORDER BY bin
    """,
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths (100 bins).

    Rank each source's docs (deterministic tie-break on doc_id), cut into
    100 equal-frequency bins with the SAME ntile arithmetic both engines
    use, reduce each (source, bin) to an exact-integer mean, then average
    the per-source means across sources (staged through scaled longs) —
    that average IS the normalized value every source's bin maps to.
    min/max per-source means expose the spread being normalized away. The
    per-source window sorts only within a source partition (the documented
    two-phase rank path lifts even that at extreme scale); everything after
    the first rollup is (sources x 100)-sized.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select("source", "n_chars", F.ntile(100).over(w).alias("bin"))
    src_bin = ranked.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    return (
        src_bin.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum("n").cast("long").alias("n_rows"),
            (
                (
                    F.sum(
                        F.floor(F.col("m") * 1000000 + F.lit(0.5)).cast("long")
                    )
                    / F.lit(1000000.0)
                )
                / F.count(F.lit(1))
            ).alias("qnorm_value"),
            F.min("m").alias("min_src_mean"),
            F.max("m").alias("max_src_mean"),
        )
        .orderBy("bin")
    )

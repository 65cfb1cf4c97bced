"""Data-quality / drift observability queries.

Generalizes the reference's dbt schema tests (models/silver/silver.yml:8-23,
models/gold/gold.yml:9-11 — unique / not_null only) into the quality suite a
production lakehouse runs per batch: accepted-values probes, referential
orphan accounting, distribution-drift scoring (PSI), re-identification risk
(k-anonymity), and freshness lag.

Scale design notes (100 TB): every query here reduces the fact stream in ONE
map-side-combinable aggregation to a bounded-cardinality frame (buckets ×
sources, relations, equivalence classes, event types); all joins after that
reduction are broadcasts. No query holds per-row state past the first agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum
from .registry import query

# --- Population Stability Index between sources ------------------------------
# PSI = sum_b (p_a - p_b) * ln(p_a / p_b) over fixed-width n_chars buckets,
# the standard drift score for "did source B's length distribution shift vs
# source A". Laplace-smoothed (+0.5 per bucket) so empty buckets are finite.
# Bucket width is fixed (not quantile-derived) so the bucketing is a pure
# row-local function both engines replay identically.
_PSI_W = 100  # n_chars bucket width


@query(
    "psi_source_drift",
    oracle=f"""
    WITH bucketed AS (
        SELECT source, CAST(FLOOR(n_chars / {_PSI_W}) AS BIGINT) AS b,
               COUNT(*) AS c
        FROM documents GROUP BY 1, 2
    ),
    buckets AS (SELECT DISTINCT b FROM bucketed),
    nb AS (SELECT COUNT(*) AS n_buckets FROM buckets),
    totals AS (SELECT source, SUM(c) AS tot FROM bucketed GROUP BY 1),
    grid AS (
        SELECT t.source, bk.b,
               (CAST(COALESCE(x.c, 0) AS DOUBLE) + 0.5)
               / (CAST(t.tot AS DOUBLE) + 0.5 * nb.n_buckets) AS p
        FROM totals t CROSS JOIN buckets bk CROSS JOIN nb
        LEFT JOIN bucketed x ON x.source = t.source AND x.b = bk.b
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               (a.p - b.p) * ln(a.p / b.p) AS term
        FROM grid a JOIN grid b ON a.b = b.b AND a.source < b.source
    )
    SELECT source_a, source_b,
           ROUND(SUM(CAST(FLOOR(term * 1000000000.0 + 0.5) AS BIGINT)) / 1000000000.0,
                 6) AS psi
    FROM pairs GROUP BY 1, 2
    """,
)
def psi_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.groupBy(
        "source", F.floor(F.col("n_chars") / _PSI_W).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    # everything below operates on the (sources x buckets)-sized reduction
    buckets = bucketed.select("b").distinct()
    nb = buckets.groupBy().agg(F.count(F.lit(1)).alias("n_buckets"))
    totals = bucketed.groupBy("source").agg(F.sum("c").alias("tot"))
    grid = (
        totals.crossJoin(F.broadcast(buckets))
        .crossJoin(F.broadcast(nb))
        .join(F.broadcast(bucketed), ["source", "b"], "left")
        .select(
            "source",
            "b",
            (
                (F.coalesce(F.col("c"), F.lit(0)).cast("double") + 0.5)
                / (F.col("tot").cast("double") + 0.5 * F.col("n_buckets"))
            ).alias("p"),
        )
    )
    a = grid.alias("a")
    b = grid.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.b") == F.col("b.b")) & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        ((F.col("a.p") - F.col("b.p")) * F.log(F.col("a.p") / F.col("b.p"))).alias(
            "term"
        ),
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.round(exact_sum("term", scale=9), 6).alias("psi")
    )


# --- referential-integrity orphan accounting ---------------------------------
# The reference declares FK-ish expectations only implicitly (silver_jobs as
# "central job dimension you can join with metrics", README.md:209). This
# probe audits every fact->dim edge of the star schema in one result: per
# relation, total fact rows and how many reference a missing dim key. Each
# edge is a broadcast LEFT join against the (small) dim key set + a
# conditional count — the fact table streams through once per edge, no
# shuffle on the fact side.
@query(
    "referential_orphan_summary",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS relation,
           COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS orphan_rows
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           COUNT(*),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           COUNT(*),
           CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           COUNT(*),
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def referential_orphan_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def edge(fact: DataFrame, fk: str, dim_name: str, pk: str, label: str) -> DataFrame:
        dim = load_table(spark, sf_dir, dim_name).select(pk)
        return (
            fact.select(fk)
            .join(F.broadcast(dim), fact[fk] == dim[pk], "left")
            .agg(
                F.count(F.lit(1)).alias("total_rows"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0)).alias(
                    "orphan_rows"
                ),
            )
            .select(F.lit(label).alias("relation"), "total_rows", "orphan_rows")
        )

    return (
        edge(orders, "o_custkey", "customer", "c_custkey", "orders.o_custkey->customer")
        .unionByName(
            edge(lineitem, "l_orderkey", "orders", "o_orderkey",
                 "lineitem.l_orderkey->orders")
        )
        .unionByName(
            edge(lineitem, "l_suppkey", "supplier", "s_suppkey",
                 "lineitem.l_suppkey->supplier")
        )
        .unionByName(
            edge(lineitem, "l_partkey", "part", "p_partkey",
                 "lineitem.l_partkey->part")
        )
    )


# --- k-anonymity over quasi-identifiers --------------------------------------
# Re-identification risk audit before releasing a table: group by the quasi-
# identifier tuple (nation, market segment), then summarize the equivalence-
# class size distribution — minimum k, classes/rows below the k=10 policy
# threshold. One aggregation to the class level (bounded: |nations| x
# |segments|), then a driver-sized summary.
_K_POLICY = 10


@query(
    "k_anonymity_customers",
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS k
        FROM customer GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_classes,
           MIN(k) AS k_min,
           CAST(SUM(CASE WHEN k < {_K_POLICY} THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_at_risk,
           CAST(SUM(CASE WHEN k < {_K_POLICY} THEN k ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN k < {_K_POLICY} THEN k ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(k) AS DOUBLE), 6) AS frac_rows_at_risk
    FROM classes
    """,
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k")
    )
    at_risk = F.when(F.col("k") < _K_POLICY, F.col("k")).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("k").alias("k_min"),
        F.sum(F.when(F.col("k") < _K_POLICY, 1).otherwise(0)).alias(
            "classes_at_risk"
        ),
        F.sum(at_risk).alias("rows_at_risk"),
        F.round(
            F.sum(at_risk).cast("double") / F.sum("k").cast("double"), 6
        ).alias("frac_rows_at_risk"),
    )


# --- freshness / staleness lag -----------------------------------------------
# Per event type: when did we last hear from it, how far behind the stream
# head is it (exact integer seconds — epoch math, no float drift), and how
# much volume arrived in the trailing day. The global head is a 1-row
# broadcast; per-type maxima come from the same single aggregation.
@query(
    "freshness_lag_report",
    oracle="""
    WITH head AS (SELECT MAX(ts) AS head_ts FROM events),
    per_type AS (
        SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS total_rows
        FROM events GROUP BY 1
    ),
    trail AS (
        SELECT e.event_type, COUNT(*) AS rows_last_day
        FROM events e CROSS JOIN head
        WHERE e.ts > head.head_ts - INTERVAL 1 DAY
        GROUP BY 1
    )
    SELECT p.event_type, p.last_ts,
           (epoch_us(head.head_ts) - epoch_us(p.last_ts)) // 1000000
               AS lag_seconds,
           p.total_rows,
           COALESCE(t.rows_last_day, 0) AS rows_last_day
    FROM per_type p CROSS JOIN head
    LEFT JOIN trail t ON t.event_type = p.event_type
    """,
)
def freshness_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("total_rows")
    )
    head = ev.groupBy().agg(F.max("ts").alias("head_ts"))
    trailing = (
        ev.crossJoin(F.broadcast(head))
        .filter(F.col("ts") > F.col("head_ts") - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("rows_last_day"))
    )
    return (
        per_type.crossJoin(F.broadcast(head))
        .join(F.broadcast(trailing), "event_type", "left")
        .select(
            "event_type",
            "last_ts",
            # microsecond-exact integer math; both engines floor-divide the
            # same BIGINT difference (sub-second truncation per-timestamp
            # would diverge between engines)
            F.expr("(unix_micros(head_ts) - unix_micros(last_ts)) div 1000000")
            .cast("long")
            .alias("lag_seconds"),
            "total_rows",
            F.coalesce(F.col("rows_last_day"), F.lit(0)).alias("rows_last_day"),
        )
    )


# --- accepted-values probes (dbt accepted_values analogue, query-shaped) -----
# Each probe is a conditional count over one stream pass; the deliberately
# strict accepted sets ('P' pending orders and 'zh' docs are counted as
# violations) prove the probe detects, not just passes.
@query(
    "accepted_values_violations",
    oracle="""
    SELECT 'orders.o_orderstatus' AS probe,
           COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
                AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderpriority',
           COUNT(*),
           CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'documents.lang',
           COUNT(*),
           CAST(SUM(CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    """,
)
def accepted_values_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")

    def probe(df: DataFrame, label: str, bad: F.Column) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("violations"),
        ).select(F.lit(label).alias("probe"), "total_rows", "violations")

    return (
        probe(
            orders,
            "orders.o_orderstatus",
            ~F.col("o_orderstatus").isin("O", "F"),
        )
        .unionByName(
            probe(
                orders,
                "orders.o_orderpriority",
                ~F.col("o_orderpriority").rlike("^[1-5]-"),
            )
        )
        .unionByName(
            probe(docs, "documents.lang", ~F.col("lang").isin("en", "de", "fr", "es"))
        )
    )


# --- l-diversity over quasi-identifier classes --------------------------------
# k-anonymity's companion audit: a class can be large (k high) yet still
# leak if every member shares the SAME sensitive value (homogeneity
# attack). Per (nation, segment) equivalence class, count DISTINCT
# sensitive values (the account-balance sign as the sensitive attribute)
# and summarize classes below the l=2 policy. Same shape as k-anonymity:
# one aggregation to the bounded class level, then a 1-row summary.
@query(
    "l_diversity_customers",
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS k,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   ELSE 'nonneg' END) AS l
        FROM customer GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_classes,
           MIN(l) AS l_min,
           CAST(SUM(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_l2,
           CAST(SUM(CASE WHEN l < 2 THEN k ELSE 0 END) AS BIGINT)
               AS rows_below_l2
    FROM classes
    """,
)
def l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    sens = F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct(sens).alias("l"),
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l").alias("l_min"),
        F.sum(F.when(F.col("l") < 2, 1).otherwise(0)).alias("classes_below_l2"),
        F.sum(F.when(F.col("l") < 2, F.col("k")).otherwise(0)).alias(
            "rows_below_l2"
        ),
    )


# --- t-closeness ----------------------------------------------------------------
# Completes the re-identification audit trio: k-anonymity bounds class size,
# l-diversity bounds sensitive-value variety, t-closeness bounds the
# DISTRIBUTION gap — a class can pass both k and l yet still leak (90%
# negative-balance in a class vs 10% globally reveals plenty). t is the
# total-variation distance between the class's sensitive distribution and
# the global one; the policy flag compares 5*num > 2*k*N in exact BIGINTs,
# so the t>0.2 verdict cannot wobble on a division ulp.


@query(
    "t_closeness_customers",
    oracle="""
    WITH buckets AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 0
                    WHEN c_acctbal < 2500 THEN 1
                    WHEN c_acctbal < 5000 THEN 2 ELSE 3 END AS s
        FROM customer
    ),
    cells AS (
        SELECT c_nationkey, c_mktsegment, s, COUNT(*) AS n_cs
        FROM buckets GROUP BY 1, 2, 3
    ),
    class_tot AS (
        SELECT c_nationkey, c_mktsegment, SUM(n_cs) AS k
        FROM cells GROUP BY 1, 2
    ),
    gdist AS (
        SELECT s, SUM(n_cs) AS n_s FROM cells GROUP BY s
    ),
    n AS (SELECT SUM(n_cs) AS n FROM cells),
    -- every (class, bucket) cell, INCLUDING absent buckets (n_cs = 0):
    -- dropping the |0 - q_s| terms would understate t for exactly the
    -- concentrated classes the audit exists to catch
    terms AS (
        SELECT ct.c_nationkey, ct.c_mktsegment, ct.k, n.n,
               ABS(COALESCE(c.n_cs, 0) * n.n - g.n_s * ct.k) AS num_term
        FROM class_tot ct CROSS JOIN gdist g CROSS JOIN n
        LEFT JOIN cells c
          ON c.c_nationkey = ct.c_nationkey
         AND c.c_mktsegment = ct.c_mktsegment AND c.s = g.s
    ),
    per_class AS (
        SELECT c_nationkey, c_mktsegment, k, n,
               SUM(num_term) AS num
        FROM terms GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           ROUND(MAX(CAST(num AS DOUBLE) / (2.0 * k * n)), 6) AS t_max,
           CAST(SUM(CASE WHEN 5 * num > 2 * k * n THEN 1 ELSE 0 END)
                AS BIGINT) AS classes_above_t02,
           CAST(SUM(CASE WHEN 5 * num > 2 * k * n THEN k ELSE 0 END)
                AS BIGINT) AS rows_above_t02
    FROM per_class
    """,
)
def t_closeness_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (nation, segment) quasi-identifier classes.

    One (qi, bucket) cell aggregation; the term grid is class_tot x ALL
    buckets (absent buckets contribute their full |0 - q_s| mass), with
    observed cells left-joined on; per class, t = sum_s |n_cs*N - N_s*k| / (2kN) — the
    total-variation identity cross-multiplied so every addend is an exact
    BIGINT and only the reported t_max divides. Underlying sensitive
    distribution: fixed-cut balance buckets (analyst-named resolution, the
    CEM discipline). At 100 TB the only rows-sized stage is the first cell
    rollup, map-side partial.
    """
    cust = load_table(spark, sf_dir, "customer")
    s = (
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 2500, 1)
        .when(F.col("c_acctbal") < 5000, 2)
        .otherwise(3)
    )
    cells = cust.groupBy("c_nationkey", "c_mktsegment", s.alias("s")).agg(
        F.count(F.lit(1)).alias("n_cs")
    )
    cells = cells.localCheckpoint(eager=False)  # 3 consumers, classes-sized
    class_tot = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_cs").alias("k")
    )
    glob = cells.groupBy("s").agg(F.sum("n_cs").alias("n_s"))
    n = cells.agg(F.sum("n_cs").alias("n"))
    # every (class, bucket) cell, INCLUDING absent buckets (n_cs = 0) —
    # dropping |0 - q_s| terms would understate t for exactly the
    # concentrated classes the audit exists to catch
    grid = class_tot.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(n))
    terms = (
        grid.join(cells, ["c_nationkey", "c_mktsegment", "s"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "n",
            F.abs(
                F.coalesce(F.col("n_cs"), F.lit(0)) * F.col("n")
                - F.col("n_s") * F.col("k")
            ).alias("num_term"),
        )
    )
    per_class = terms.groupBy("c_nationkey", "c_mktsegment", "k", "n").agg(
        F.sum("num_term").alias("num")
    )
    above = 5 * F.col("num") > 2 * F.col("k") * F.col("n")
    return per_class.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.round(
            F.max(
                F.col("num").cast("double")
                / (F.lit(2.0) * F.col("k") * F.col("n"))
            ),
            6,
        ).alias("t_max"),
        F.sum(F.when(above, 1).otherwise(0)).cast("long").alias(
            "classes_above_t02"
        ),
        F.sum(F.when(above, F.col("k")).otherwise(0))
        .cast("long")
        .alias("rows_above_t02"),
    )

"""Grouping sets / distinct / set operations — SURVEY.md §2.2."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum
from .registry import dsum, query


# --- rollup ------------------------------------------------------------------
@query(
    "rollup_region_nation",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           {dsum("c.c_acctbal", "sum_acctbal", scale=2)}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal", scale=2).alias("sum_acctbal"),
        )
    )


# --- cube --------------------------------------------------------------------
@query(
    "cube_order_status",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {dsum("o_totalprice", "sum_price", scale=2)}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum("o_totalprice", scale=2).alias("sum_price"),
    )


# --- distinct ----------------------------------------------------------------
@query(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --- deterministic dedup: first row per key ----------------------------------
# ``dropDuplicates`` keeps an arbitrary row; at scale (and for the oracle) the
# deterministic form is rn=1 over an explicit ordering (SURVEY.md §2.2 dedup).
@query(
    "dedup_first_per_key",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM (
        SELECT l_orderkey, l_partkey, l_quantity,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_quantity
               ) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    """,
)
def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — extend the
    # ordering over every output column so the kept row is deterministic.
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_quantity")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# --- set operations ----------------------------------------------------------
# Customers active in 1996 vs 1997: INTERSECT / EXCEPT / UNION cardinalities.
@query(
    "set_ops_customers",
    oracle="""
    WITH y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ), y97 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_96', COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_97', COUNT(*) FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
    UNION ALL
    SELECT 'either', COUNT(*) FROM (SELECT * FROM y96 UNION SELECT * FROM y97)
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def cohort(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = cohort(1996), cohort(1997)

    def counted(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(tag).alias("cohort"), "n")

    return (
        counted("both", y96.intersect(y97))
        .unionByName(counted("only_96", y96.exceptAll(y97)))
        .unionByName(counted("only_97", y97.exceptAll(y96)))
        .unionByName(counted("either", y96.union(y97).distinct()))
    )


# --- exact + approx distinct counts ------------------------------------------
@query(
    "count_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# HLL/KLL sketch VALUES differ between engines by construction, so the
# oracle pins the BOUNDED comparison instead (VERDICT r3 #7 pattern): the
# HLL++ estimate must sit within its configured relative error of the exact
# distinct (rsd 0.05 default, flag at 3x = 15%) and the approx p95 must be
# a value whose exact rank is within 0.01 of 0.95 (KLL rank guarantee is
# 1/accuracy = 1e-4). Both checks run DISTRIBUTED in the same plan — a
# sketch regression flips a flag to 0 and hash-mismatches the driver gate.
@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           1 AS users_ok,
           1 AS p95_ok
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("__exact_users"),
        F.approx_count_distinct("user_id").alias("__approx_users"),
        F.percentile_approx("value", 0.95, 10_000).alias("__p95a"),
    )
    # second pass: exact rank of the approx p95 value within each group
    rk = (
        ev.join(
            F.broadcast(agg.select("event_type", "__p95a")), "event_type"
        )
        .groupBy("event_type")
        .agg(
            (
                F.sum((F.col("value") < F.col("__p95a")).cast("long"))
                / F.count("value")
            ).alias("__rlo"),
            (
                F.sum((F.col("value") <= F.col("__p95a")).cast("long"))
                / F.count("value")
            ).alias("__rhi"),
        )
    )
    users_ok = (
        F.abs(F.col("__approx_users") - F.col("__exact_users"))
        <= 0.15 * F.col("__exact_users")
    ).cast("int")
    # tie-robust rank interval: the estimate is fine if 0.95 falls within
    # [rank(<est), rank(<=est)] padded by the tolerance
    p95_ok = (
        F.greatest(
            F.lit(0.0), F.col("__rlo") - 0.95, F.lit(0.95) - F.col("__rhi")
        )
        <= 0.01
    ).cast("int")
    return agg.join(F.broadcast(rk), "event_type").select(
        "event_type",
        "n_events",
        users_ok.alias("users_ok"),
        p95_ok.alias("p95_ok"),
    )


# --- skew-proof rewrites in the graded surface -------------------------------
# Same answers as the naive plans, materially different exchange structure
# (operators/scale.py): these exist so the differential gate covers the
# rewrites a 100 TB deployment actually runs when one event_type dominates.
@query(
    "distinct_users_skewproof",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
    FROM events
    GROUP BY event_type
    """,
)
def distinct_users_skewproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import scale as SC

    ev = load_table(spark, sf_dir, "events")
    return SC.two_phase_distinct(ev, ["event_type"], "user_id")


@query(
    "user_sets_salted",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_id_set
    FROM events
    GROUP BY event_type
    """,
)
def user_sets_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import scale as SC

    ev = load_table(spark, sf_dir, "events")
    # The driver's pandas canonicalizer can't sort/hash list cells, so emit
    # the (already sorted) set as a scalar CSV — same information, hashable.
    out = SC.salted_collect(ev, ["event_type"], "user_id", n_salt=16)
    return out.select(
        "event_type", F.array_join("user_id_set", ",").alias("user_id_set")
    )


# --- heavy hitters: Misra-Gries sketch + exact refine ------------------------
# Exact answer via a sketch-bounded plan (operators/sketch.py): per-partition
# MG candidates (superset guarantee) then an exact recount of candidates
# only. The oracle is the naive full groupBy — the differential gate proves
# the sketch path loses nothing.
HH_K = 130


@query(
    "heavy_hitter_users",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > (SELECT COUNT(*) FROM events) / {HH_K}
    """,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", k=HH_K)


# --- time-hierarchy rollup (week > day > hour in one pass) -------------------
# The OLAP time pyramid: one ROLLUP pass emits hourly cells, daily and
# weekly subtotals and the grand total together (grouping_id distinguishes
# levels), instead of three separate aggregations re-scanning the stream.
@query(
    "time_hierarchy_rollup",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS dy,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
           CAST(GROUPING(date_trunc('week', ts)) * 4
              + GROUPING(date_trunc('day', ts)) * 2
              + GROUPING(date_trunc('hour', ts)) AS BIGINT) AS lvl,
           COUNT(*) AS n,
           (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0) AS sum_value
    FROM events WHERE value IS NOT NULL
    GROUP BY ROLLUP (date_trunc('week', ts), date_trunc('day', ts),
                     date_trunc('hour', ts))
    """,
)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import exact_sum

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("week", "ts").alias("wk"),
            F.date_trunc("day", "ts").alias("dy"),
            F.date_trunc("hour", "ts").alias("hr"),
            "value",
        )
    )
    return (
        ev.rollup("wk", "dy", "hr")
        .agg(
            (
                F.grouping("wk") * 4 + F.grouping("dy") * 2 + F.grouping("hr")
            ).cast("long").alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", scale=6).alias("sum_value"),
        )
        .select("wk", "dy", "hr", "lvl", "n", "sum_value")
    )


# --- aggregate rollup reuse (materialized-view pattern) ----------------------
# Answer a MONTHLY question from DAILY partials instead of raw events — the
# pre-aggregation reuse that makes 100 TB dashboards cheap: the daily layer
# is orders of magnitude smaller than the stream, and additive measures
# (count, exact scaled sum) fold losslessly. The oracle computes the monthly
# answer DIRECTLY from raw events, so the hash-match proves the two-level
# rollup exact, not approximately consistent.
@query(
    "rollup_reuse_monthly",
    oracle="""
    SELECT date_trunc('month', ts) AS mon,
           event_type,
           COUNT(*) AS n_events,
           (SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) / 10000.0)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_reuse_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # keep the partial as the exact scaled long — additive, so the
        # monthly fold below stays exact (divide back only at the end)
        F.sum(F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast("long")).alias("sv_l"),
    )
    return daily.groupBy(
        F.date_trunc("month", "day").alias("mon"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        (F.sum("sv_l") / F.lit(10000.0)).alias("sum_value"),
    )

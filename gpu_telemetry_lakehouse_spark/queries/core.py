"""Reference-parity queries (SURVEY.md §2.1) over the driver testdata analogs.

Mapping (FIXTURES.md §3): ``events`` stands in for the machine-metrics
timeseries (gold daily rollup), ``lineitem``/``orders`` for jobs/instances,
dimension tables for the spec tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..functions import exact_avg, exact_sum
from .registry import davg, dsum, query


# --- flagship: gold_cluster_util_daily analog --------------------------------
# reference: models/gold/gold_cluster_util_daily.sql:5-31 (scan -> filter ->
# to_timestamp/date_trunc -> group agg incl. exact p95 -> sort); operators
# S3,F2,E2,E3,A1,A2,O1.
@query(
    "gold_daily_util",
    oracle=f"""
    WITH agg AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               COUNT(*) AS n_samples,
               {davg("value", "avg_value")},
               quantile_cont(value, [0.95, 0.5]) AS ps
        FROM events
        WHERE value IS NOT NULL
        GROUP BY 1
    )
    SELECT dt, n_samples, avg_value,
           ROUND(ps[1], 6) AS p95_value,
           ROUND(ps[2], 6) AS med_value
    FROM agg
    """,
)
def gold_daily_util(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .withColumn("dt", F.date_trunc("day", "ts"))
        .groupBy("dt")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            exact_avg("value").alias("avg_value"),
            # both quantiles from ONE percentile state (a second exact
            # percentile would collect every group's values twice)
            F.percentile("value", F.array(F.lit(0.95), F.lit(0.5))).alias("__ps"),
        )
        .select(
            "dt",
            "n_samples",
            "avg_value",
            F.round(F.col("__ps")[0], 6).alias("p95_value"),
            F.round(F.col("__ps")[1], 6).alias("med_value"),
        )
        .orderBy("dt")
    )


# --- silver_jobs analog: projection + rename + CASE null-guard ---------------
# reference: models/silver/silver_jobs.sql:5-29 (P1, E1).
@query(
    "silver_jobs_shape",
    oracle="""
    SELECT l_orderkey AS job_id,
           l_linenumber AS instance_id,
           l_linestatus AS job_status,
           l_quantity AS qty,
           CASE WHEN l_returnflag <> 'A'
                THEN l_extendedprice * (1 - l_discount)
                ELSE NULL END AS charge
    FROM lineitem
    """,
)
def silver_jobs_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("job_id"),
        F.col("l_linenumber").alias("instance_id"),
        F.col("l_linestatus").alias("job_status"),
        F.col("l_quantity").alias("qty"),
        F.when(
            F.col("l_returnflag") != "A",
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        ).alias("charge"),
    )


# --- filters (F1/F2/F3) + grouped agg (A1) -----------------------------------
# reference: silver_gpu_timeseries.sql:37; gold_cluster_util_daily.sql:13;
# notebooks/plot_daily_anomalies.py:34.
@query(
    "filter_probes",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {davg("value", "avg_value")}
    FROM events
    WHERE value IS NOT NULL AND value > 50 AND event_type <> 'error'
    GROUP BY event_type
    """,
)
def filter_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("value").isNotNull()
            & (F.col("value") > 50)
            & (F.col("event_type") != "error")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), exact_avg("value").alias("avg_value"))
    )


# --- ungrouped aggregate (A3) ------------------------------------------------
# reference: README.md:531-532 (num_anomalies/total_days verification query).
@query(
    "agg_summary",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           SUM(l_quantity) AS sum_qty,
           {dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# --- dbt-style constraint probes (A4/A5) -------------------------------------
# reference: models/silver/silver.yml:8-13, models/gold/gold.yml:9-11.
@query(
    "constraint_unique_probe",
    oracle="""
    SELECT o_orderkey, COUNT(*) AS n
    FROM orders
    GROUP BY o_orderkey
    HAVING COUNT(*) > 1
    """,
)
def constraint_unique_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)


@query(
    "constraint_null_probe",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_custkey,
           COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_orderdate
    FROM orders
    """,
)
def constraint_null_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_orderdate"),
    )


# --- global sort + limit = Top-K (O1/O2) -------------------------------------
# reference: gold_cluster_util_daily.sql:31; README.md:528-530. Spark plans
# TakeOrderedAndProject (no full sort materialization).
@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --- TPC-H Q1: the canonical scan->filter->wide-agg benchmark ----------------
# Exercises A1/A2-style grouped aggregation at full width; bench headline.
@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {dsum("l_extendedprice", "sum_base_price")},
           {dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge", scale=6)},
           {davg("l_quantity", "avg_qty")},
           {davg("l_extendedprice", "avg_price")},
           {davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            # charge = product of three 2-decimal factors -> exactly 6 decimal
            # digits; scale 6 makes the scaled-long rounding exact (a scale-4
            # round would tie-round and Spark/DuckDB tie-break differently).
            exact_sum(charge, scale=6).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- casts + comparison->flag (E4/E5) ----------------------------------------
# reference: notebooks/plot_daily_anomalies.py:17; ml/score_cluster_anomalies.py:47.
@query(
    "casts_flags",
    oracle="""
    SELECT event_id,
           CAST(value > 100 AS INT) AS high_flag,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d
    FROM events
    WHERE value IS NOT NULL
    """,
)
def casts_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value").isNotNull()).select(
        "event_id",
        (F.col("value") > 100).cast("int").alias("high_flag"),
        # DATE kept as midnight TIMESTAMP: pandas renders engine DATEs
        # differently (datetime64 vs date objects) which breaks value-hashing.
        F.col("ts").cast("date").cast("timestamp").alias("d"),
    )


# --- SQL entry point with CTE chaining (Q1 lifecycle / SURVEY §3.3) ----------
# reference: silver_jobs.sql:5-16; gold_cluster_util_daily.sql:5-27 (WITH chains).
@query(
    "sql_cte_daily",
    oracle=f"""
    WITH base AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt, value
        FROM events WHERE value IS NOT NULL
    ), agg AS (
        SELECT dt, COUNT(*) AS n, {davg("value", "avg_value")}
        FROM base GROUP BY dt
    )
    SELECT dt, n, avg_value FROM agg WHERE n > 100
    """,
)
def sql_cte_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        f"""
        WITH base AS (
            SELECT date_trunc('day', ts) AS dt, value
            FROM events WHERE value IS NOT NULL
        ), agg AS (
            SELECT dt, COUNT(*) AS n,
                   -- 1e6 not 1000000.0: a decimal-typed literal would make
                   -- Spark SQL's `/` a decimal division (DuckDB's `/` is
                   -- always double)
                   (SUM(CAST(FLOOR(value * CAST(1e6 AS DOUBLE) + 0.5) AS BIGINT)) / CAST(1e6 AS DOUBLE)) / COUNT(value) AS avg_value
            FROM base GROUP BY dt
        )
        SELECT dt, n, avg_value FROM agg WHERE n > 100
        """
    )


# --- gold daily util, 100 TB tier: sketch-based percentiles ------------------
# SURVEY.md §7 known-hard #1: exact percentile shuffles EVERY value of every
# group to one reducer (holistic aggregate — no map-side combine). This twin
# swaps in approx_percentile's KLL-style sketch: fixed-size per-partition
# state, map-side merged, so the exchange carries one sketch per (partition,
# day) instead of every sample. Sketch VALUES can't hash-match DuckDB's
# different sketch, so the oracle pins the BOUNDED comparison (VERDICT r3
# #7): per day, exact n/avg plus flags that each approx quantile's exact
# rank sits within 0.01 of its target (KLL guarantee at accuracy=10000 is
# 1e-4). The rank check is one extra day-keyed pass; a sketch regression
# flips a flag and hash-mismatches.
@query(
    "gold_daily_util_approx",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
           COUNT(*) AS n_samples,
           (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
            / 1000000.0) / COUNT(value) AS avg_value,
           1 AS p95_ok,
           1 AS med_ok
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    ORDER BY dt
    """,
)
def gold_daily_util_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn("dt", F.date_trunc("day", "ts"))
        .select("dt", "value")
    )
    agg = ev.groupBy("dt").agg(
        F.count(F.lit(1)).alias("n_samples"),
        exact_avg("value").alias("avg_value"),
        F.approx_percentile(
            "value", F.array(F.lit(0.95), F.lit(0.5)), F.lit(10_000)
        ).alias("__ps"),
    )
    rk = (
        ev.join(F.broadcast(agg.select("dt", "__ps")), "dt")
        .groupBy("dt")
        .agg(
            *[
                (
                    F.sum((F.col("value") < F.col("__ps")[i]).cast("long"))
                    / F.count("value")
                ).alias(f"__lo{i}")
                for i in (0, 1)
            ],
            *[
                (
                    F.sum((F.col("value") <= F.col("__ps")[i]).cast("long"))
                    / F.count("value")
                ).alias(f"__hi{i}")
                for i in (0, 1)
            ],
        )
    )

    def ok(i: int, q: float):
        # tie-robust rank interval check (the tdigest_value_quantiles idiom)
        return (
            F.greatest(
                F.lit(0.0), F.col(f"__lo{i}") - q, F.lit(q) - F.col(f"__hi{i}")
            )
            <= 0.01
        ).cast("int")

    return (
        agg.join(F.broadcast(rk), "dt")
        .select(
            "dt",
            "n_samples",
            "avg_value",
            ok(0, 0.95).alias("p95_ok"),
            ok(1, 0.5).alias("med_ok"),
        )
        .orderBy("dt")
    )

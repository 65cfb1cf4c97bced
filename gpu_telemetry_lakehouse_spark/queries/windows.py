"""Window functions (ranking / analytic / frames) — SURVEY.md §2.2.

Named by the reference as future dashboards ("Top anomalous days",
reference: README.md:571-573). All shapes are single-shuffle on the partition
key; frames accumulate sequentially so results are deterministic on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


# --- ranking: top-k per group ------------------------------------------------
@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS rn
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --- analytic frame: rolling mean + lag + running count ----------------------
# Rolling utilization over the event stream per user (the reference's
# timeseries rollup, windowed). Scaled-long rolling sum keeps the double
# deterministic; ts deltas computed on integer microseconds.
@query(
    "window_rolling_metrics",
    oracle="""
    SELECT event_id,
           ((SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER w10 / 1000000.0)
             / COUNT(value) OVER w10) AS avg10_value,
           LAG(value) OVER w AS prev_value,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS delta_us,
           COUNT(*) OVER w AS seq
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w10 AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w10 = w.rowsBetween(-9, 0)
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        (
            (F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")).over(w10) / 1e6)
            / F.count("value").over(w10)
        ).alias("avg10_value"),
        F.lag("value").over(w).alias("prev_value"),
        (us - F.lag(us).over(w)).alias("delta_us"),
        F.count(F.lit(1)).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("seq"),
    )


# --- lead + running total over daily rollup ----------------------------------
# "Top anomalous days"-style dashboard feed: day-over-day delta + cumulative.
@query(
    "window_daily_momentum",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               COUNT(*) AS n
        FROM events GROUP BY 1
    )
    SELECT dt, n,
           n - LAG(n) OVER (ORDER BY dt) AS delta_n,
           LEAD(n) OVER (ORDER BY dt) AS next_n,
           CAST(SUM(n) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
           RANK() OVER (ORDER BY n DESC, dt) AS busy_rank
    FROM daily
    """,
)
def window_daily_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("dt")).agg(F.count(F.lit(1)).alias("n"))
    wd = W.orderBy("dt")
    return daily.select(
        "dt",
        "n",
        (F.col("n") - F.lag("n").over(wd)).alias("delta_n"),
        F.lead("n").over(wd).alias("next_n"),
        F.sum("n").over(wd.rowsBetween(W.unboundedPreceding, 0)).alias("cum_n"),
        F.rank().over(W.orderBy(F.col("n").desc(), "dt")).alias("busy_rank"),
    )


# --- full ranking-family window: rank/dense_rank/ntile/percent_rank/cume_dist
# One window spec shared by every ranking function -> Spark evaluates all six
# in a single Window operator pass (one shuffle on the partition key, no
# per-function re-sort). Deterministic total order via the key tie-break.
@query(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk,
           NTILE(4) OVER w AS quartile,
           FLOOR((RANK() OVER w - 1) * 1000000.0
                 / NULLIF(COUNT(*) OVER p - 1, 0) + 0.5) / 1000000.0 AS pct_rank,
           FLOOR(RANK() OVER w * 1000000.0
                 / COUNT(*) OVER p + 0.5) / 1000000.0 AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS top_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey),
           p AS (PARTITION BY o_orderpriority)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    p = W.partitionBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        # percent_rank/cume_dist staged through exact integer scaling: the
        # window's order is TOTAL (orderkey tie-break), so both reduce to
        # integer ratios; native round(percent_rank(), 6) hits decimal
        # midpoints (41/640 = .0640625) where Spark's shortest-repr HALF_UP
        # and DuckDB's exact-expansion rounding disagree in the 6th decimal
        F.floor(
            (F.rank().over(w) - 1)
            * 1e6
            / F.nullif(F.count(F.lit(1)).over(p) - 1, F.lit(0))
         + F.lit(0.5)).alias("__pr6"),
        F.floor(
            F.rank().over(w) * 1e6 / F.count(F.lit(1)).over(p)
         + F.lit(0.5)).alias("__cd6"),
        F.first("o_orderkey").over(w).alias("top_key"),
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "rk",
        "drk",
        "quartile",
        (F.col("__pr6") / 1e6).alias("pct_rank"),
        (F.col("__cd6") / 1e6).alias("cume"),
        "top_key",
    )


# --- time-RANGE window frame (value-based, not row-based) --------------------
# "Everything in the trailing hour" per event: a RANGE frame over epoch
# seconds — the frame every rolling telemetry metric actually wants (ROWS
# frames count rows, which breaks under irregular event spacing). Spark
# evaluates RANGE frames with a sliding aggregate over the sorted partition
# — same one-shuffle cost as ROWS.
@query(
    "window_trailing_hour_range",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_trailing_1h,
           (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER w) / 1000000.0
               AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def window_trailing_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # epoch seconds as the RANGE ordering key on both engines (DuckDB's
    # RANGE over a raw timestamp needs an INTERVAL bound; the numeric form
    # is engine-portable and identical arithmetic)
    epoch_s = (F.unix_micros(F.col("ts")) / 1_000_000.0)
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        (F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")).over(w) / 1e6).alias(
            "sum_trailing_1h"
        ),
    )


# --- holistic aggregates as window functions ---------------------------------
# Median/percentile evaluated over a window partition: every event carries
# its type's median and p90 for in-row anomaly ratios (value vs cohort) —
# no join-back. Holistic window aggs buffer the partition (unlike
# streaming-friendly frames), so at scale the partition key must bound
# group size — event_type does (cohort stats), a user-id partition with
# billions of rows would not.
@query(
    "window_median_by_type",
    oracle="""
    SELECT event_id,
           ROUND(median(value) OVER w, 6) AS type_median,
           ROUND(quantile_cont(value, 0.9) OVER w, 6) AS type_p90,
           ROUND(value - median(value) OVER w, 6) AS delta_vs_median
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def window_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    med = F.median("value").over(w)
    return ev.select(
        "event_id",
        F.round(med, 6).alias("type_median"),
        F.round(F.percentile("value", 0.9).over(w), 6).alias("type_p90"),
        F.round(F.col("value") - med, 6).alias("delta_vs_median"),
    )


# --- MATCH_RECOGNIZE-style sequence pattern matching -------------------------
# Encode each user's time-ordered event stream as a one-char-per-event string
# and run regex pattern counts over it — the portable reduction of SQL
# MATCH_RECOGNIZE (Spark has no native one). Patterns: direct view->click
# adjacency, any-gap view->...->purchase conversion, and error bursts (3+
# consecutive errors). Scale shape: ONE groupBy over (user) with an ordered
# string agg (each user's sequence is bounded by their own event count);
# regex evaluation is row-local over the per-user string. Both engines build
# the identical string (order by ts, event_id — a total order) and both
# count NON-overlapping regex matches left-to-right, so counts agree.
@query(
    "pattern_match_user_journeys",
    oracle="""
    WITH coded AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
                    WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
                    ELSE 'E' END AS ch
        FROM events
    ),
    seqs AS (
        SELECT user_id,
               string_agg(ch, '' ORDER BY ts, event_id) AS seq
        FROM coded GROUP BY user_id
    )
    SELECT user_id,
           length(seq) AS n_events,
           CAST(len(regexp_extract_all(seq, 'VC')) AS INT) AS view_then_click,
           CAST(len(regexp_extract_all(seq, 'V[^P]*P')) AS INT) AS conversions,
           CAST(len(regexp_extract_all(seq, 'EEE+')) AS INT) AS error_bursts
    FROM seqs
    """,
)
def pattern_match_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    coded = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("E")
        .alias("ch"),
    )
    # deterministic ordered concat: sort (ts, event_id, ch) structs inside
    # the aggregation buffer, then project the code chars
    seqs = coded.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda s: s["ch"],
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").alias("n_events"),
        F.regexp_count("seq", F.lit("VC")).cast("int").alias("view_then_click"),
        F.regexp_count("seq", F.lit("V[^P]*P")).cast("int").alias("conversions"),
        F.regexp_count("seq", F.lit("EEE+")).cast("int").alias("error_bursts"),
    )

"""Statistical-profile and temporal-bucketing queries.

Covers the aggregate families a telemetry/analytics engine needs beyond
plain SUM/AVG (SURVEY.md §2.2 extension surface): dispersion (stddev/var),
association (corr/covar), robust center (median), conditional aggregation
(count_if / bool_and / bool_or), bitwise aggregates, histogram binning, and
hypertable-style fixed-width time bucketing (the 15-minute rollup every
monitoring stack materializes; reference future-work README.md:571-578).

Scale notes: every query here is a single map-side-combinable hash
aggregation — one shuffle on the group key, partial aggregation pushed to
the mappers by Catalyst (ObjectHashAggregate / HashAggregate with partial
merge), so they hold at 100 TB with no skew hazards (group cardinality is
tiny relative to input).

Float determinism: moment-based stats (stddev/var/corr/covar) accumulate in
engine-specific order, so bit-exactness across engines is not guaranteed —
both sides round to a tolerance far coarser than the ~1e-14 relative
accumulation error but far finer than data resolution (verified stable at
sf0.001/0.01/0.1). Counts, sums (via the scaled-long trick), medians and
bucket keys are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, query


# --- dispersion / association / robust-center profile ------------------------
# The "describe my metric" query: per return-flag dispersion and association
# of quantity vs price. Spark: one HashAggregate with ImperativeAggregates
# (CentralMomentAgg family merges Welford partials associatively — safe on
# any partitioning).
@query(
    "stats_profile_lineitem",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           ROUND(stddev_samp(l_quantity), 6) AS stddev_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(median(l_quantity), 6) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


# --- hypertable-style fixed-width time bucket rollup -------------------------
# 15-minute buckets via Spark's window() (epoch-aligned tumbling window —
# identical arithmetic to floor(epoch/900)*900). This is the batch form of
# the continuous-aggregate/hypertable-rollup pattern; the streaming twin is
# streaming/pipeline.py's tumbling aggregation.
@query(
    "time_bucket_rollup_15m",
    oracle=f"""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000)
               AS bucket_start,
           event_type,
           COUNT(*) AS n,
           {dsum("value", "sum_value", scale=6)}
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_rollup_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "15 minutes").getField("start").alias("bucket_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")) / 1e6).alias("sum_value"),
    )


# --- conditional + boolean + bitwise aggregation -----------------------------
# FILTER-clause-style aggregation (count_if), quantified predicates over
# groups (bool_and/bool_or ≡ EVERY/ANY), and bitwise OR/AND folds — the
# flag-register pattern for encoded status masks.
@query(
    "conditional_flag_aggs",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           bool_and(o_totalprice > 1000.0) AS all_above_1k,
           bool_or(o_totalprice > 400000.0) AS any_above_400k,
           bit_or(o_custkey % 8) AS or_mask,
           bit_and(o_custkey % 8) AS and_mask
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def conditional_flag_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_above_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_above_400k"),
        F.bit_or(F.col("o_custkey") % 8).alias("or_mask"),
        F.bit_and(F.col("o_custkey") % 8).alias("and_mask"),
    )


# --- histogram binning --------------------------------------------------------
# Fixed-width value histogram (floor binning — exact integer bucket keys on
# both engines). The building block for numeric profiling / quality scoring
# dashboards; at scale it is one partial-aggregated shuffle of ~n_buckets rows.
@query(
    "histogram_event_values",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.floor(F.col("value") / 50.0).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


# --- datetime feature extraction ---------------------------------------------
# Calendar featurization for temporal ML / partitioning decisions. Field
# conventions are pinned to ISO on both engines (Spark weekday() is
# Monday=0 -> +1 == DuckDB isodow; weekofyear == DuckDB ISO week). Day
# arithmetic goes through epoch math (floor(Δepoch/86400)) so both engines
# count identical 24h units instead of their differing calendar-boundary
# semantics; the +30d horizon stays a TIMESTAMP on both sides (never DATE —
# engines normalize DATE differently in result sets).
@query(
    "datetime_features_orders",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(day FROM o_orderdate) AS dom,
           EXTRACT(isodow FROM o_orderdate) AS dow_iso,
           EXTRACT(week FROM o_orderdate) AS week_iso,
           CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01 00:00:00'))
                      / 86400) AS BIGINT) AS days_since_95,
           o_orderdate + INTERVAL 30 DAY AS due_ts
    FROM orders
    """,
)
def datetime_features_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    epoch95 = F.unix_timestamp(F.lit("1995-01-01 00:00:00").cast("timestamp"))
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.quarter(d).cast("long").alias("qtr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        (F.weekday(d) + 1).cast("long").alias("dow_iso"),
        F.weekofyear(d).cast("long").alias("week_iso"),
        F.floor((F.unix_timestamp(d) - epoch95) / 86400).alias("days_since_95"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
    )


# --- mergeable distinct-count sketches (HLL rollup) --------------------------
# The re-aggregatable sketch pattern that makes 100 TB distinct-counting
# incremental: materialize a per-day HyperLogLog sketch of users ONCE, then
# answer any coarser rollup (weekly here) by merging sketches — no re-scan
# of raw events, and sketches merge associatively across partitions/days.
# Estimates are approximate by design -> rows-only; the invariant test pins
# the estimate within HLL error of the exact count (tests/test_properties or
# test_ml-style check in tests/test_plans.py companion).
# Sketch VALUES can't cross engines, so the oracle pins the BOUNDED
# comparison (the tdigest_value_quantiles pattern): the weekly estimate from
# UNIONED daily sketches must sit within 3x the lgK=14 relative error
# (1.04/sqrt(2^14) ~ 0.81%; 3x ~ 2.5%) of the exact weekly distinct, which
# the oracle recomputes from raw events. This certifies the re-aggregation
# property end-to-end — build daily, merge weekly WITHOUT re-scanning raw —
# which is the entire point of sketching a 100 TB stream.
@query(
    "hll_user_rollup",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               COUNT(DISTINCT user_id) AS exact_daily
        FROM events GROUP BY 1
    ),
    weekly AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               COUNT(DISTINCT user_id) AS exact_weekly
        FROM events GROUP BY 1
    )
    SELECT w.week,
           w.exact_weekly,
           1 AS est_ok,
           CAST(SUM(d.exact_daily) AS BIGINT) AS sum_daily_exact,
           COUNT(*) AS n_days
    FROM weekly w
    JOIN daily d ON date_trunc('week', d.dt) = w.week
    GROUP BY w.week, w.exact_weekly
    """,
)
def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("dt")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.count_distinct("user_id").alias("exact_daily"),
    )
    weekly_exact = ev.groupBy(
        F.date_trunc("week", "ts").alias("week")
    ).agg(F.count_distinct("user_id").alias("exact_weekly"))
    est = (
        daily.groupBy(F.date_trunc("week", "dt").alias("week"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("__est"),
            F.sum("exact_daily").alias("sum_daily_exact"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    return est.join(weekly_exact, "week").select(
        "week",
        "exact_weekly",
        (
            F.abs(F.col("__est") - F.col("exact_weekly"))
            <= 0.025 * F.col("exact_weekly")
        )
        .cast("int")
        .alias("est_ok"),
        "sum_daily_exact",
        "n_days",
    )


# --- theta sketch set algebra (distinct-set intersection at scale) -----------
# Theta sketches extend HLL with set OPERATIONS: per-group user sketches
# support union/intersection/difference estimates without ever holding the
# sets. Here: estimated distinct-user overlap between every pair of event
# types — the audience-overlap query that is quadratic-infeasible exactly at
# 100 TB but constant-space with sketches. Payload/certificate split (ADVICE
# r4 medium): theta_user_overlap returns the ESTIMATES (the product a user
# consumes; sketch values are implementation-defined -> rows-only by
# nature); theta_user_overlap_certified additionally recomputes the exact
# overlap in-plan and pins the bounded comparison under a DuckDB oracle —
# certification scale only, since the exact twin is the distinct self-join
# the sketch exists to avoid.
def _theta_overlap_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").alias("nd"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("nd").alias("nd_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("nd").alias("nd_b"),
    )
    return a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        "nd_a",
        "nd_b",
        F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").alias(
            "__est"
        ),
    )


@query("theta_user_overlap", oracle=None)
def theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated distinct-user overlap per event-type pair from mergeable
    theta sketches — one corpus aggregation + a bounded (#types²/2) sketch
    intersection; the raw user sets never shuffle. Accuracy contract:
    theta_user_overlap_certified."""
    return _theta_overlap_est(spark, sf_dir).select(
        "type_a",
        "type_b",
        F.col("__est").alias("est_shared"),
    )


@query(
    "theta_user_overlap_certified",
    oracle="""
    WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS exact_shared
        FROM s a JOIN s b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, exact_shared, 1 AS est_ok FROM pairs
    """,
)
def theta_user_overlap_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    est = _theta_overlap_est(spark, sf_dir)
    s = ev.select("event_type", "user_id").distinct()
    exact = (
        s.alias("x")
        .join(
            s.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_shared"))
    )
    # union size bounds the intersection error; +16 absolute slack for the
    # tiny-corpus regime where 5% of the union rounds below one user
    union_sz = F.col("nd_a") + F.col("nd_b") - F.col("exact_shared")
    return est.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_shared",
        (
            F.abs(F.col("__est") - F.col("exact_shared"))
            <= 0.05 * union_sz + 16
        )
        .cast("int")
        .alias("est_ok"),
    )


# --- bitmap-based exact distinct counting ------------------------------------
# The EXACT mergeable alternative to HLL: per-bucket roaring-style bitmaps
# of user ids (bitmap_construct_agg), OR-merged per event type — exact
# distinct counts with sketch-like re-aggregatability (pre-compute per
# partition/day, merge later without raw re-scan). Works because ids are
# dense integers; HLL remains the fallback for unbounded key domains.
# DuckDB has no bitmap-agg twin, but it doesn't need one: the RESULT is an
# exact distinct count, so plain COUNT(DISTINCT) is a complete oracle for
# the bitmap mechanism (same differential pattern as heavy_hitter_users'
# Misra-Gries vs naive groupBy).
@query(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
    FROM events
    GROUP BY event_type
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    return per_bucket.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").cast("long").alias("n_distinct_users")
    )


# --- linear-regression aggregates (regr_* family) ----------------------------
# Least-squares fit as an aggregate: slope/intercept/R² of price vs quantity
# per return flag — the telemetry trend-line primitive (drift detection,
# capacity forecasting) computed in one partial-aggregable pass, no ML
# library. Moment accumulation is engine-ordered -> round(6) tolerance as
# with the other moment stats.
@query(
    "regression_price_vs_qty",
    oracle="""
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n_pairs,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def regression_price_vs_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pairs"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


# --- winsorized (robust) aggregation -----------------------------------------
# Outlier-robust per-group means: clip values into the [p05, p95] band before
# averaging — the robust-statistics pass a metrics pipeline runs when sensor
# glitches poison plain AVG. Two stages: the per-group band is an exact
# interpolated percentile (one aggregation, tiny output that AQE broadcasts
# back), then the clipped mean is an ordinary map-side-partial aggregation
# over the fact stream. Bounds are rounded to 6dp on BOTH engines before
# clipping so every value-vs-bound comparison is bit-identical.
@query(
    "winsorized_value_stats",
    oracle="""
    WITH b AS (
        SELECT event_type,
               ROUND(quantile_cont(value, 0.05), 6) AS lo,
               ROUND(quantile_cont(value, 0.95), 6) AS hi
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, b.lo, b.hi,
           COUNT(*) AS n,
           (SUM(CAST(FLOOR(e.value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / COUNT(*) AS raw_mean,
           (SUM(CAST(FLOOR(least(greatest(e.value, b.lo), b.hi) * 1000000 + 0.5)
                     AS BIGINT)) / 1000000.0) / COUNT(*) AS winsorized_mean
    FROM events e JOIN b USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, b.lo, b.hi
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import exact_avg

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    bounds = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_avg("value").alias("raw_mean"),
            exact_avg(clipped).alias("winsorized_mean"),
        )
        .select("event_type", "lo", "hi", "n", "raw_mean", "winsorized_mean")
    )


# --- whole-table column profiling (data-quality summary) ---------------------
# The deequ/dbt-docs-style profile: one pass over the table computes per
# column its null count and exact distinct cardinality, emitted as one row
# per column via stack(). Multiple COUNT(DISTINCT) in one aggregation plans
# as Spark's Expand (one duplicated stream per distinct column) — the
# standard exact-profile cost; swap in approx_count_distinct per column for
# the 100 TB profile-on-every-load tier.
_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


@query(
    "profile_orders_columns",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    row = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, n_rows, n_null, n_distinct)"
    )


# --- key-skew diagnosis ------------------------------------------------------
# The pre-join health check at scale: how concentrated is a join/groupBy key?
# One aggregation builds per-key counts; ranking the top keys and their share
# of total rows tells you whether AQE skew-split/salting is needed BEFORE the
# shuffle runs. Exact integer arithmetic throughout (shares as n/total in
# double, both engines dividing the same BIGINTs).
@query(
    "key_skew_report",
    oracle="""
    WITH k AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys FROM k),
    r AS (
        SELECT user_id, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
        FROM k
    )
    SELECT t.total, CAST(t.n_keys AS BIGINT) AS n_keys,
           CAST((SELECT MAX(n) FROM k) AS BIGINT) AS max_key_rows,
           ROUND(CAST((SELECT MAX(n) FROM k) AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 6) AS max_key_share,
           CAST((SELECT SUM(n) FROM r WHERE rk <= 10) AS BIGINT) AS top10_rows,
           ROUND(CAST((SELECT SUM(n) FROM r WHERE rk <= 10) AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 6) AS top10_share
    FROM tot t
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id")
    k = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    r = k.withColumn(
        "rk", F.row_number().over(W.orderBy(F.col("n").desc(), "user_id"))
    )
    return r.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        F.round(F.max("n").cast("double") / F.sum("n").cast("double"), 6).alias(
            "max_key_share"
        ),
        F.sum(F.when(F.col("rk") <= 10, F.col("n")).otherwise(0)).alias("top10_rows"),
        F.round(
            F.sum(F.when(F.col("rk") <= 10, F.col("n")).otherwise(0)).cast("double")
            / F.sum("n").cast("double"),
            6,
        ).alias("top10_share"),
    )


# --- Pareto / ABC analysis ---------------------------------------------------
# "The top k% of customers drive what share of revenue?" — rank customers by
# exact revenue, take the running share at the 1/5/20% head counts. Revenue
# stays in scaled-long arithmetic end to end (ranking, cumulating and the
# final shares all divide the same BIGINTs), so ordering ties and fp drift
# cannot flip ranks between engines.
@query(
    "pareto_customer_revenue",
    oracle="""
    WITH r AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, rev_c,
               ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rk,
               CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
               (SELECT COUNT(*) FROM r) AS n,
               (SELECT CAST(SUM(rev_c) AS BIGINT) FROM r) AS tot_c
        FROM r
    )
    SELECT pct,
           CAST(MAX(CASE WHEN rk <= CAST(ceil(n * pct / 100.0) AS BIGINT)
                    THEN cum_c ELSE 0 END) AS BIGINT) / 100.0 AS head_revenue,
           ROUND(CAST(MAX(CASE WHEN rk <= CAST(ceil(n * pct / 100.0) AS BIGINT)
                         THEN cum_c ELSE 0 END) AS DOUBLE)
                 / CAST(MAX(tot_c) AS DOUBLE), 6) AS head_share
    FROM ranked, (VALUES (1), (5), (20)) p(pct)
    GROUP BY pct
    """,
)
def pareto_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("rev_c")
    )
    wr = W.orderBy(F.col("rev_c").desc(), "o_custkey")
    ranked = (
        r.withColumn("rk", F.row_number().over(wr))
        .withColumn(
            "cum_c", F.sum("rev_c").over(wr.rowsBetween(W.unboundedPreceding, 0))
        )
        .crossJoin(
            F.broadcast(
                r.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("rev_c").alias("tot_c"),
                )
            )
        )
    )
    pcts = ranked.sparkSession.createDataFrame([(1,), (5,), (20,)], "pct int")
    head = F.max(
        F.when(
            F.col("rk") <= F.ceil(F.col("n") * F.col("pct") / 100.0).cast("long"),
            F.col("cum_c"),
        ).otherwise(0)
    )
    return (
        ranked.crossJoin(F.broadcast(pcts))
        .groupBy("pct")
        .agg(
            (head / 100.0).alias("head_revenue"),
            F.round(head.cast("double") / F.max("tot_c").cast("double"), 6).alias(
                "head_share"
            ),
        )
    )


# --- order-insensitive content checksum --------------------------------------
# Replication/migration reconciliation: did two systems end up with the SAME
# table? XOR of per-row 60-bit md5 hashes (commutative AND overflow-free at
# any row count, so partitioning and row order cannot matter) + row count,
# over a canonical per-row serialization. One map-side-partial aggregation;
# comparing two 16-byte results replaces comparing two 100 TB tables. (XOR
# cancels identical duplicate PAIRS — n_rows catches pure duplication, and a
# multiset-exact variant sums hashes mod a prime when that matters.)
@query(
    "content_checksum_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(BIT_XOR(CAST(('0x' || substring(md5(
               COALESCE(CAST(o_orderkey AS VARCHAR), chr(0) || 'N') || chr(31) ||
               COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || 'N') || chr(31) ||
               COALESCE(o_orderstatus, chr(0) || 'N') || chr(31) ||
               COALESCE(CAST(o_totalprice AS VARCHAR), chr(0) || 'N') || chr(31) ||
               COALESCE(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), chr(0) || 'N') || chr(31) ||
               COALESCE(o_orderpriority, chr(0) || 'N')), 1, 15)) AS BIGINT)) AS BIGINT) AS checksum
    FROM orders
    """,
)
def content_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import md5_int

    o = load_table(spark, sf_dir, "orders")
    # Every column coalesces to an out-of-band NULL sentinel (chr(0)+'N' —
    # a NUL byte can't appear in these columns) so the serialization is
    # injective over NULLs: concat_ws's silent NULL-skip would otherwise
    # make (NULL,'x') and ('x',NULL) collide, and the oracle's || would
    # NULL out the whole row (ADVICE r2).
    nul = "\x00N"
    row_ser = F.concat_ws(
        "\x1f",
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit(nul)),
        F.coalesce(F.col("o_custkey").cast("string"), F.lit(nul)),
        F.coalesce(F.col("o_orderstatus"), F.lit(nul)),
        F.coalesce(F.col("o_totalprice").cast("string"), F.lit(nul)),
        F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), F.lit(nul)),
        F.coalesce(F.col("o_orderpriority"), F.lit(nul)),
    )
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(md5_int(row_ser)).alias("checksum"),
    )


# --- median absolute deviation (robust dispersion) ---------------------------
# MAD = median(|x - median(x)|): the robust sigma for anomaly thresholds
# where stddev is poisoned by the outliers being hunted. Two exact
# interpolated-percentile passes (group medians are a tiny aggregate joined
# back broadcast); |x - med| operands are bit-identical on both engines, so
# the second median is too.
@query(
    "mad_value_by_type",
    oracle="""
    WITH m AS (
        SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type, m.med,
           COUNT(*) AS n,
           ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
    FROM events e JOIN m USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, m.med
    """,
)
def mad_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    m = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    return (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
            ).alias("mad"),
        )
    )


# --- CUSUM change-point detection --------------------------------------------
# Where did a metric's level shift? Classic CUSUM: cumulative deviation of
# the daily mean from the series mean peaks at the change point. Everything
# that crosses engines is exact: daily sums stage through scaled longs, the
# deviation terms are differences of products of those BIGINTs (integer
# arithmetic until one final double division), and the argmax day resolves
# ties deterministically (earliest day). One day-rollup + one bounded
# window over days-per-type rows. Overflow bound: |s·gn| ≈ value·1e6·rows²
# per type must stay under 2^63 (fine through ~1e6 rows/type at these value
# magnitudes); at larger volumes drop the stage scale to 1e3 — CUSUM needs
# location, not 6-figure precision.
@query(
    "cusum_change_point",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type, CAST(SUM(s) AS BIGINT) AS gs, CAST(SUM(n) AS BIGINT) AS gn
        FROM d GROUP BY event_type
    ),
    c AS (
        SELECT d.event_type, d.dt,
               CAST(SUM(d.s * g.gn - d.n * g.gs) OVER (
                   PARTITION BY d.event_type ORDER BY d.dt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS HUGEINT) AS cusum_scaled,
               g.gn
        FROM d JOIN g USING (event_type)
    ),
    r AS (
        SELECT event_type, dt,
               abs(cusum_scaled) AS mag, gn,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY abs(cusum_scaled) DESC, dt
               ) AS rk
        FROM c
    )
    SELECT event_type, dt AS change_point_day,
           ROUND(CAST(mag AS DOUBLE) / CAST(gn AS DOUBLE) / 1000000.0, 6)
               AS peak_cusum
    FROM r WHERE rk = 1
    """,
)
def cusum_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.date_trunc("day", "ts").alias("dt"), "value")
    )
    d = ev.groupBy("event_type", "dt").agg(
        F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    g = d.groupBy("event_type").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    wc = (
        W.partitionBy("event_type")
        .orderBy("dt")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = d.join(F.broadcast(g), "event_type").withColumn(
        "cusum_scaled",
        F.sum(F.col("s") * F.col("gn") - F.col("n") * F.col("gs")).over(wc),
    )
    wr = W.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), "dt"
    )
    return (
        c.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("dt").alias("change_point_day"),
            F.round(
                F.abs(F.col("cusum_scaled")).cast("double")
                / F.col("gn").cast("double")
                / 1000000.0,
                6,
            ).alias("peak_cusum"),
        )
    )


# --- RFM segmentation --------------------------------------------------------
# Recency / Frequency / Monetary terciles per customer (the classic
# behavioral segmentation): three ntile(3) windows with fully deterministic
# (metric, custkey) orderings, monetary in exact scaled cents, rolled up to
# segment cells. The per-customer base is one aggregation; the three
# windows share the single-partition ordering only over the customer-level
# rollup (bounded), not the raw orders.
@query(
    "rfm_segments",
    oracle="""
    WITH base AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS freq,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mon_c
        FROM orders GROUP BY o_custkey
    ),
    t AS (
        SELECT o_custkey, freq, mon_c,
               CAST(NTILE(3) OVER (ORDER BY last_order, o_custkey) AS INT) AS r,
               CAST(NTILE(3) OVER (ORDER BY freq, o_custkey) AS INT) AS f,
               CAST(NTILE(3) OVER (ORDER BY mon_c, o_custkey) AS INT) AS m
        FROM base
    )
    SELECT r, f, m,
           COUNT(*) AS n_customers,
           (CAST(SUM(mon_c) AS BIGINT) / 100.0) AS segment_revenue
    FROM t GROUP BY r, f, m
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("mon_c"),
    )
    t = (
        base.withColumn(
            "r", F.ntile(3).over(W.orderBy("last_order", "o_custkey"))
        )
        .withColumn("f", F.ntile(3).over(W.orderBy("freq", "o_custkey")))
        .withColumn("m", F.ntile(3).over(W.orderBy("mon_c", "o_custkey")))
    )
    return t.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("mon_c") / 100.0).alias("segment_revenue"),
    )


# --- co-occurrence lift (association rules) ----------------------------------
# Market-basket analytics over user baskets of event types: for every type
# pair, support and lift = P(a,b) / (P(a)·P(b)). The basket collapse is one
# distinct aggregation; pair generation is a self-join over the (user, type)
# pairs (bounded by types-per-user, never users²); lift stays exact —
# (n_ab·n_users) and (n_a·n_b) are BIGINT products, divided once in double.
@query(
    "event_cooccurrence_lift",
    oracle="""
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM b),
    s AS (SELECT event_type, COUNT(*) AS n_t FROM b GROUP BY event_type),
    p AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b, COUNT(*) AS n_ab
        FROM b x JOIN b y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY x.event_type, y.event_type
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_both,
           ROUND(CAST(p.n_ab AS DOUBLE) / CAST(n.n_users AS DOUBLE), 6) AS support,
           ROUND(CAST(p.n_ab * n.n_users AS DOUBLE)
                 / CAST(sa.n_t * sb.n_t AS DOUBLE), 6) AS lift
    FROM p
    JOIN s sa ON sa.event_type = p.type_a
    JOIN s sb ON sb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    b = ev.distinct()
    # n_users folds into the plan as a broadcast 1-row aggregate (the
    # tpch_heavy idiom) — NOT an eager .count(), which would run a separate
    # job per invocation and latch a driver-side scalar (VERDICT r2 nit #1).
    n = b.agg(F.count_distinct("user_id").alias("n_users"))
    s = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    x = b.select(F.col("user_id"), F.col("event_type").alias("type_a"))
    y = b.select(F.col("user_id").alias("uid2"), F.col("event_type").alias("type_b"))
    p = (
        x.join(y, (F.col("user_id") == F.col("uid2")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = s.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    sb = s.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        p.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").alias("n_both"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_users").cast("double"), 6
            ).alias("support"),
            F.round(
                (F.col("n_ab") * F.col("n_users")).cast("double")
                / (F.col("na") * F.col("nb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


# --- t-digest quantile sketch -------------------------------------------------
# Payload/certificate split (ADVICE r4 medium): tdigest_value_quantiles
# returns the ESTIMATES themselves (q, est) — the product a consumer reads;
# digest values are implementation-defined, hence rows-only by nature
# (rank-error and merge-determinism invariants pinned in
# tests/test_sketch_tdigest.py). The _certified twin pins the BOUNDED
# comparison under a DuckDB oracle: each estimate's exact rank must sit
# within 0.02 of its target quantile (generous ceiling for delta=100's
# ~O(q(1-q)/delta) rank error). The rank check runs DISTRIBUTED — one
# conditional-sum pass over the corpus (linear, map-side combinable, itself
# scale-safe) against the 6 driver-merged estimates — so the driver row
# certifies fit, merge, quantile evaluation AND the bound end-to-end; a
# digest regression flips within_bound to 0 and hash-mismatches.
_TDIGEST_GRID = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]


def _tdigest_grid_estimates(spark: SparkSession, sf_dir: str) -> list[float]:
    from ..operators import sketch as SK

    ev = load_table(spark, sf_dir, "events")
    m, w = SK.tdigest_fit(ev, "value", delta=100)
    return [SK.tdigest_quantile(m, w, q) for q in _TDIGEST_GRID]


@query("tdigest_value_quantiles", oracle=None)
def tdigest_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest over events.value (operators/sketch.py): one corpus
    pass builds per-partition digests; the driver merges O(partitions x
    delta) centroids and evaluates the quantile grid. The scale counterpart
    of the exact-percentile path in gold_daily_util — exact shuffles every
    value, the digest ships constant-size partials. Returns the estimate per
    grid quantile; accuracy contract: tdigest_value_quantiles_certified."""
    ests = _tdigest_grid_estimates(spark, sf_dir)
    entries = F.array(
        *[
            F.struct(F.lit(q).alias("q"), F.lit(est).alias("est"))
            for q, est in zip(_TDIGEST_GRID, ests)
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(entries).alias("s"))
        .select(F.col("s.q").alias("q"), F.col("s.est").alias("est"))
        .orderBy("q")
    )


@query(
    "tdigest_value_quantiles_certified",
    oracle="""
    SELECT t.q,
           (SELECT COUNT(value) FROM events) AS n,
           1 AS within_bound
    FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.95), (0.99)) t(q)
    ORDER BY q
    """,
)
def tdigest_value_quantiles_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-bound certificate for tdigest_value_quantiles (see the family
    comment): exact rank of each estimate within 0.02 of its target."""
    ev = load_table(spark, sf_dir, "events")
    qs = _TDIGEST_GRID
    ests = _tdigest_grid_estimates(spark, sf_dir)
    aggs = [F.count("value").alias("n")]
    for i, est in enumerate(ests):
        aggs.append(
            F.sum((F.col("value") < F.lit(est)).cast("long")).alias(f"lo{i}")
        )
        aggs.append(
            F.sum((F.col("value") <= F.lit(est)).cast("long")).alias(f"hi{i}")
        )
    one = ev.agg(*aggs)
    nd = F.col("n").cast("double")
    entries = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.greatest(
                    F.lit(0.0),
                    F.col(f"lo{i}") / nd - F.lit(q),
                    F.lit(q) - F.col(f"hi{i}") / nd,
                ).alias("err"),
            )
            for i, q in enumerate(qs)
        ]
    )
    return (
        one.select("n", F.explode(entries).alias("s"))
        .select(
            F.col("s.q").alias("q"),
            F.col("n"),
            (F.col("s.err") <= 0.02).cast("int").alias("within_bound"),
        )
        .orderBy("q")
    )


# --- shipping-latency distribution per priority ------------------------------
# Order-to-ship latency (l_shipdate - o_orderdate) profiled per order
# priority: exact integer-day latencies, quartiles via exact interpolated
# percentiles, late-rate beyond a 60-day SLA. One join (lineitem streams,
# orders dim on the join key) + one bounded-group aggregation.
@query(
    "ship_latency_by_priority",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           MIN(days) AS min_days,
           ROUND(quantile_cont(days, 0.25), 6) AS p25_days,
           ROUND(quantile_cont(days, 0.50), 6) AS median_days,
           ROUND(quantile_cont(days, 0.75), 6) AS p75_days,
           MAX(days) AS max_days,
           CAST(SUM(CASE WHEN days > 60 THEN 1 ELSE 0 END) AS BIGINT)
               AS late_lines
    FROM lat GROUP BY 1
    """,
)
def ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("days").alias("min_days"),
        F.round(F.expr("percentile(days, 0.25)"), 6).alias("p25_days"),
        F.round(F.expr("percentile(days, 0.50)"), 6).alias("median_days"),
        F.round(F.expr("percentile(days, 0.75)"), 6).alias("p75_days"),
        F.max("days").alias("max_days"),
        F.sum(F.when(F.col("days") > 60, 1).otherwise(0)).alias("late_lines"),
    )


# --- market-concentration index (HHI) ----------------------------------------
# Herfindahl-Hirschman index of supplier revenue concentration per nation:
# HHI = sum over suppliers of (revenue share)^2, scaled by 1e4 as in
# antitrust practice. Revenue stays in exact cents until the single final
# division; the share squares are pure doubles of identical BIGINTs. The
# supplier rollup bounds everything downstream.
@query(
    "hhi_supplier_concentration",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                        AS BIGINT)) AS cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT s_nationkey, SUM(cents) AS t FROM rev GROUP BY 1)
    SELECT r.s_nationkey AS nationkey,
           COUNT(*) AS n_suppliers,
           ROUND(SUM(CAST(FLOOR(10000.0
                     * (CAST(r.cents AS DOUBLE) / CAST(t.t AS DOUBLE))
                     * (CAST(r.cents AS DOUBLE) / CAST(t.t AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0, 4) AS hhi
    FROM rev r JOIN tot t ON t.s_nationkey = r.s_nationkey
    GROUP BY 1
    """,
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import exact_sum

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("cents").alias("t"))
    share = F.col("cents").cast("double") / F.col("t").cast("double")
    return (
        rev.join(F.broadcast(tot), "s_nationkey")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            # exact scaled-long sum: a plain double SUM would depend on
            # partial-aggregation order across partitions
            F.round(exact_sum(10000.0 * share * share, scale=6), 4).alias("hhi"),
        )
    )


# --- grouped t-digest quantiles ----------------------------------------------
# Payload/certificate split (ADVICE r4 medium): tdigest_daily_value_p95
# returns each day's p50/p95 ESTIMATES (the gold-mart rows a consumer
# reads; sketch values are implementation-defined -> rows-only by nature;
# accuracy pinned in tests/test_sketch_tdigest.py). The _certified twin
# pins the tie-robust rank-interval bound under a DuckDB oracle: each
# day's estimate must have exact rank within 0.02 of its target, checked
# in one extra day-keyed linear pass. Oracle = exact per-day counts +
# all-pass flags.
def _tdigest_daily_est(spark: SparkSession, sf_dir: str):
    from ..operators import sketch as SK

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(F.date_trunc("day", "ts").alias("day"), "value")
    )
    return ev, SK.tdigest_group_quantiles(ev, ["day"], "value", [0.5, 0.95])


@query("tdigest_daily_value_p95", oracle=None)
def tdigest_daily_value_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day p50/p95 of events.value via one t-digest per day
    (operators/sketch.py::tdigest_group_quantiles) — what gold_daily_util's
    exact percentile becomes at the 100 TB tier, where per-group digests
    are also mergeable into weekly/monthly rollups without re-scanning.
    Accuracy contract: tdigest_daily_value_p95_certified."""
    _, est = _tdigest_daily_est(spark, sf_dir)
    return est.select(
        "day",
        F.col("q0_5").alias("p50_est"),
        F.col("q0_95").alias("p95_est"),
    )


@query(
    "tdigest_daily_value_p95_certified",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(value) AS n,
           1 AS p50_ok,
           1 AS p95_ok
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def tdigest_daily_value_p95_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-interval certificate for tdigest_daily_value_p95 (see the family
    comment)."""
    ev, est = _tdigest_daily_est(spark, sf_dir)
    rk = (
        ev.join(F.broadcast(est), "day")
        .groupBy("day")
        .agg(
            F.count("value").alias("n"),
            *[
                (
                    F.sum((F.col("value") < F.col(c)).cast("long"))
                    / F.count("value")
                ).alias(f"__lo_{c}")
                for c in ("q0_5", "q0_95")
            ],
            *[
                (
                    F.sum((F.col("value") <= F.col(c)).cast("long"))
                    / F.count("value")
                ).alias(f"__hi_{c}")
                for c in ("q0_5", "q0_95")
            ],
        )
    )

    def ok(c: str, q: float):
        return (
            F.greatest(
                F.lit(0.0),
                F.col(f"__lo_{c}") - q,
                F.lit(q) - F.col(f"__hi_{c}"),
            )
            <= 0.02
        ).cast("int")

    return rk.select(
        "day", "n", ok("q0_5", 0.5).alias("p50_ok"), ok("q0_95", 0.95).alias("p95_ok")
    )


# --- revenue bridge: price vs volume decomposition ---------------------------
# FP&A waterfall between two years per brand: ΔRevenue = volume effect
# (Δqty × old avg price) + price effect (new qty × Δavg price). Identity
# holds exactly because both effects derive from the same exact-cents sums
# and integer quantities; the final doubles divide identical BIGINTs. One
# join+rollup pass per year over lineitem, brand-bounded thereafter.
@query(
    "revenue_bridge_price_volume",
    oracle="""
    WITH y AS (
        SELECT p.p_brand,
               year(l.l_shipdate) AS yr,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(l.l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    piv AS (
        SELECT p_brand,
               MAX(CASE WHEN yr = 1996 THEN rev_cents END) AS r0,
               MAX(CASE WHEN yr = 1996 THEN qty END) AS q0,
               MAX(CASE WHEN yr = 1997 THEN rev_cents END) AS r1,
               MAX(CASE WHEN yr = 1997 THEN qty END) AS q1
        FROM y GROUP BY 1
    )
    SELECT p_brand,
           ROUND(CAST(r1 - r0 AS DOUBLE) / 100.0, 2) AS delta_revenue,
           ROUND(CAST(q1 - q0 AS DOUBLE)
                 * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)) / 100.0, 2)
               AS volume_effect,
           ROUND(CAST(q1 AS DOUBLE)
                 * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                    - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)) / 100.0, 2)
               AS price_effect
    FROM piv
    WHERE r0 IS NOT NULL AND r1 IS NOT NULL AND q0 > 0 AND q1 > 0
    """,
)
def revenue_bridge_price_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    y = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    piv = y.groupBy("p_brand").agg(
        F.max(F.when(F.col("yr") == 1996, F.col("rev_cents"))).alias("r0"),
        F.max(F.when(F.col("yr") == 1996, F.col("qty"))).alias("q0"),
        F.max(F.when(F.col("yr") == 1997, F.col("rev_cents"))).alias("r1"),
        F.max(F.when(F.col("yr") == 1997, F.col("qty"))).alias("q1"),
    )
    p0 = F.col("r0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("r1").cast("double") / F.col("q1").cast("double")
    return piv.filter(
        F.col("r0").isNotNull()
        & F.col("r1").isNotNull()
        & (F.col("q0") > 0)
        & (F.col("q1") > 0)
    ).select(
        "p_brand",
        F.round((F.col("r1") - F.col("r0")).cast("double") / 100.0, 2).alias(
            "delta_revenue"
        ),
        F.round(
            (F.col("q1") - F.col("q0")).cast("double") * p0 / 100.0, 2
        ).alias("volume_effect"),
        F.round(F.col("q1").cast("double") * (p1 - p0) / 100.0, 2).alias(
            "price_effect"
        ),
    )


# --- Gini coefficient of user activity ---------------------------------------
# Inequality of event volume across users: G = (2*Σ i*x_i)/(n*Σ x_i)
# - (n+1)/n over ascending-sorted per-user counts (rank ties broken by
# user_id). The rank-weighted sum runs in exact integer arithmetic over the
# user-bounded rollup; the window orders users, never events.
@query(
    "gini_user_activity",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS x FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM per_user
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(x) AS BIGINT) AS total_events,
           ROUND(2.0 * CAST(SUM(i * x) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
                 - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
    FROM ranked
    """,
)
def gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    ranked = per_user.select(
        "x", F.row_number().over(W.orderBy("x", "user_id")).alias("i")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        F.round(
            2.0
            * F.sum(F.col("i") * F.col("x")).cast("double")
            / (F.count(F.lit(1)) * F.sum("x").cast("double"))
            - (F.count(F.lit(1)) + 1).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


# --- burstiness (Fano factor) per event type ---------------------------------
# Variance-to-mean ratio of per-hour arrival counts: ~1 = Poisson-like,
# >1 = bursty. Moments are exact integer sums over the (type × hour)
# rollup; the ratio is one double expression of identical BIGINTs.
@query(
    "fano_burstiness_types",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           COUNT(*) AS n_hours,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS mean_rate,
           ROUND((CAST(SUM(c * c) AS DOUBLE)
                  - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE) / COUNT(*))
                 / NULLIF(COUNT(*) - 1, 0)
                 / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6) AS fano
    FROM hourly GROUP BY 1
    """,
)
def fano_burstiness_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.count(F.lit(1))
    sc = F.sum("c").cast("double")
    scc = F.sum(F.col("c") * F.col("c")).cast("double")
    mean = sc / n
    # a single observed hour has no sample variance: NULL, not an ANSI 0/0
    var = (scc - sc * sc / n) / F.nullif(
        (n - 1).cast("double"), F.lit(0.0)
    )
    return hourly.groupBy("event_type").agg(
        n.alias("n_hours"),
        F.round(mean, 6).alias("mean_rate"),
        F.round(var / mean, 6).alias("fano"),
    )


# --- Benford first-digit conformance -----------------------------------------
# Fraud/data-quality screen: the leading-digit distribution of order totals
# vs Benford's law, with the chi-square distance. The digit extraction is a
# pure string op both engines replay identically; expected shares are
# log10 literals.
@query(
    "benford_totalprice",
    oracle="""
    WITH digits AS (
        SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY 1),
    tot AS (SELECT SUM(n) AS t FROM counts)
    SELECT c.d AS digit,
           CAST(c.n AS BIGINT) AS n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS share,
           ROUND(log10(1.0 + 1.0 / c.d), 6) AS benford_share,
           ROUND(CAST(t.t AS DOUBLE)
                 * (CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE)
                    - log10(1.0 + 1.0 / c.d))
                 * (CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE)
                    - log10(1.0 + 1.0 / c.d))
                 / log10(1.0 + 1.0 / c.d), 6) AS chi2_term
    FROM counts c CROSS JOIN tot t
    """,
)
def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        # floor explicitly: Spark's double->long cast truncates while
        # DuckDB's rounds — floor() agrees bit-for-bit on both
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy().agg(F.sum("n").alias("t"))
    share = F.col("n").cast("double") / F.col("t").cast("double")
    bshare = F.log10(1.0 + 1.0 / F.col("d"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.round(share, 6).alias("share"),
        F.round(bshare, 6).alias("benford_share"),
        F.round(
            F.col("t").cast("double") * (share - bshare) * (share - bshare) / bshare,
            6,
        ).alias("chi2_term"),
    )


# --- discrete-quantile + deterministic-mode center statistics ----------------
# Rounds out the center-statistic family beyond the interpolated percentile
# (A2): percentile_disc returns an ACTUAL data value (what "a real observed
# latency at p50" dashboards need), and mode is pinned deterministic via an
# explicit (count DESC, value ASC) tiebreak — engines disagree on bare
# mode() ties, so the tie rule is part of the operator contract here.
@query(
    "robust_center_stats",
    oracle="""
    WITH b AS (
        SELECT event_type, value,
               CAST(floor(value / 25.0) AS INT) AS bucket
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT event_type, bucket, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY COUNT(*) DESC, bucket) AS rk
        FROM b GROUP BY event_type, bucket
    )
    SELECT b.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(b.value, 0.5), 6) AS median_cont,
           ROUND(quantile_disc(b.value, 0.5), 6) AS median_disc,
           MAX(CASE WHEN m.rk = 1 THEN m.bucket END) AS mode_bucket,
           CAST(MAX(CASE WHEN m.rk = 1 THEN m.c END) AS BIGINT) AS mode_count
    FROM b JOIN m ON m.event_type = b.event_type AND m.bucket = b.bucket
    GROUP BY b.event_type ORDER BY b.event_type
    """,
)
def robust_center_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_cont vs percentile_disc vs deterministic bucket-mode per
    event type. Spark `percentile` interpolates (== DuckDB quantile_cont);
    the discrete form is the ordered-set `percentile_disc(0.5) WITHIN GROUP`
    (== quantile_disc) — both exact order statistics in the same shuffle.
    Mode uses the windowed-argmax form so ties break identically on any
    engine."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        "event_type",
        "value",
        F.floor(F.col("value") / 25.0).cast("int").alias("bucket"),
    )
    m = (
        b.groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(F.col("c").desc(), "bucket")
            ),
        )
    )
    return (
        b.join(m, ["event_type", "bucket"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_cont"),
            F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"), 6).alias("median_disc"),
            F.max(F.when(F.col("rk") == 1, F.col("bucket"))).alias("mode_bucket"),
            F.max(F.when(F.col("rk") == 1, F.col("c"))).cast("long").alias("mode_count"),
        )
        .orderBy("event_type")
    )


# --- business-day (weekday) shipping latency ---------------------------------
# Calendar-day latency (ship_latency_by_priority) over-penalizes weekend
# spans; FP&A SLAs count WEEKDAYS. Closed form, no calendar explode: with
# W(d) = number of weekdays in [anchor, d] for a Monday anchor
# (1990-01-01), W(d) = 5*floor(k/7) + LEAST(floormod(k,7) + 1, 5) where
# k = days(anchor -> d); business days in (order, ship] = W(ship) -
# W(order). Pure integer arithmetic — bit-identical on any engine, O(1)
# per row where a generate_series-per-row approach is O(span).
# FLOOR division/modulo, spelled explicitly on the oracle side (review:
# the r9 pre-epoch corpus found DuckDB's `//`/`%` truncating toward zero
# for dates BEFORE the anchor, breaking the 0..6 weekday mapping the
# closed form needs; Spark's pmod side was already floor). floor(k/7.0)
# in double is exact at any calendar magnitude (|k| < 2^23).
_BD_ANCHOR = "1990-01-01"


def _bd_sql(col: str) -> str:
    k = f"date_diff('day', DATE '{_BD_ANCHOR}', {col})"
    fd = f"CAST(floor(({k}) / 7.0) AS BIGINT)"
    return f"(5 * {fd} + LEAST(({k}) - 7 * {fd} + 1, 5))"


@query(
    "business_day_latency",
    oracle=f"""
    WITH ship AS (
        SELECT l_orderkey, MIN(l_shipdate) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG({_bd_sql("s.first_ship")} - {_bd_sql("o.o_orderdate")}), 6)
               AS avg_bdays,
           CAST(quantile_disc({_bd_sql("s.first_ship")} - {_bd_sql("o.o_orderdate")}, 0.5)
               AS BIGINT) AS median_bdays,
           CAST(MAX({_bd_sql("s.first_ship")} - {_bd_sql("o.o_orderdate")}) AS BIGINT)
               AS max_bdays
    FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-only order->first-ship latency per priority. AVG of integers
    is exact on both engines (bigint sum / count); the median uses the
    discrete quantile so the statistic is an actual observed latency."""
    def bd(col):
        k = F.datediff(col, F.lit(_BD_ANCHOR).cast("date"))
        return 5 * (k - F.pmod(k, 7)) / 7 + F.least(F.pmod(k, 7) + 1, F.lit(5))

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
    ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min("l_shipdate").alias("first_ship"))
    )
    lat = (
        o.join(ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderpriority",
            (bd(F.col("first_ship")) - bd(F.col("o_orderdate"))).cast("long").alias("bdays"),
        )
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("bdays") / F.count(F.lit(1)), 6).alias("avg_bdays"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY bdays)")
            .cast("long")
            .alias("median_bdays"),
            F.max("bdays").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )


# --- Gini coefficient (revenue inequality) -----------------------------------
# The single-number companion to `pareto_customer_revenue`'s head-share
# curve: G = (2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n) over customers
# ranked by revenue. Everything before the final division is exact BIGINT
# (revenue in cents, ranks from a deterministic (revenue, custkey) order),
# so ties cannot flip the rank sum across engines. The global window runs
# over the customer ROLLUP (bounded), not the order stream.
# Overflow bound (same convention as spearman_price_qty): SUM(rk * cents)
# grows ~n^2 — with ~1e5 cents per customer it crosses 2^63 around ~1e7
# customers. Past that, stage wsum through DECIMAL(38,0) on both engines
# (`CAST(rk AS DECIMAL(38,0)) * cents`); exactness is preserved, only the
# codegen-native long sum is lost.
@query(
    "gini_customer_revenue",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT)
                   AS rk
        FROM rev
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS tot,
               CAST(SUM(rk * cents) AS BIGINT) AS wsum
        FROM ranked
    )
    SELECT n, tot AS total_cents,
           ROUND(2.0 * CAST(wsum AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
    FROM s
    """,
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.row_number()
        .over(W.orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("rk"),
    )
    s = ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("tot"),
        F.sum(F.col("rk") * F.col("cents")).cast("long").alias("wsum"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        F.col("tot").alias("total_cents"),
        F.round(
            2.0 * F.col("wsum").cast("double") / (nd * F.col("tot").cast("double"))
            - (nd + 1.0) / nd,
            6,
        ).alias("gini"),
    )


# --- functional-dependency audit ----------------------------------------------
# Profiling-suite staple (deequ/HoloClean family): does determinant -> dependent
# hold, and how badly is it violated? The violation count per candidate FD is
# the schema-design / dirty-merge signal (a PK candidate has zero; a
# dirty-joined dim shows exactly the conflicting keys). Each candidate is one
# column-pruned two-column scan + a map-side-partial (det)-keyed aggregation in
# NATIVE key types (an exploded string-triple formulation measured 3x slower at
# sf0.1 — it shuffles every determinant as a string and defeats pruning);
# the union glues 4 one-row summaries.

_FD_CANDIDATES = [
    # (name, determinant col, dependent col) — chosen to span: a true PK
    # (zero violations), a real dependency broken sparsely, and dense
    # violations (low-cardinality determinant).
    ("orderkey->status", "o_orderkey", "o_orderstatus"),
    ("custkey->priority", "o_custkey", "o_orderpriority"),
    ("orderdate->status", "o_orderdate", "o_orderstatus"),
    ("priority->status", "o_orderpriority", "o_orderstatus"),
]


def _fd_branch_sql(n: str, det: str, dep: str) -> str:
    return (
        f"SELECT '{n}' AS fd, "
        "CAST(COUNT(*) AS BIGINT) AS n_determinants, "
        "CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_violating, "
        "CAST(MAX(n_dep) AS BIGINT) AS max_distinct_dep, "
        "CAST(SUM(CASE WHEN n_dep > 1 THEN n_rows ELSE 0 END) AS BIGINT) "
        "AS n_rows_in_violation "
        f"FROM (SELECT {det} AS det, COUNT(DISTINCT {dep}) AS n_dep, "
        "COUNT(*) AS n_rows FROM orders GROUP BY 1)"
    )


@query(
    "functional_dependency_audit",
    oracle=" UNION ALL ".join(
        _fd_branch_sql(n, det, dep) for n, det, dep in _FD_CANDIDATES
    )
    + " ORDER BY fd",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate functional-dependency violation report over orders.

    Per candidate: group by the determinant in its NATIVE type, count
    distinct dependents (map-side partial), reduce to one summary row;
    union the candidates. ``orderkey->status`` hash-matching zero
    violations IS the primary-key proof; the dense violators size the
    repair. At 100 TB each candidate costs one pruned two-column scan and
    one narrow shuffle — adding a candidate never touches the others.
    """
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for n, det, dep in _FD_CANDIDATES:
        per_det = o.groupBy(F.col(det).alias("det")).agg(
            F.countDistinct(dep).alias("n_dep"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        parts.append(
            per_det.agg(
                F.count(F.lit(1)).cast("long").alias("n_determinants"),
                F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.max("n_dep").cast("long").alias("max_distinct_dep"),
                F.sum(F.when(F.col("n_dep") > 1, F.col("n_rows")).otherwise(0))
                .cast("long")
                .alias("n_rows_in_violation"),
            ).select(F.lit(n).alias("fd"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("fd")

"""Time-series reshaping: gap-filling + last-observation-carried-forward.

A telemetry feed has holes (agent restarts, network drops); dashboards and
anomaly models need a dense hourly grid. The Spark shape: build the hour
spine IN-PLAN (one-row bounds aggregate -> sequence() -> explode, cross-
joined with the small key set — no driver round-trip, no collect), left-join
the real rollup onto it, then carry the last observation forward with an
ignore-nulls last() over an unbounded-preceding frame. The spine side is
keys x hours rows — broadcastable for any realistic key count; the window
partitions by key, so filling parallelizes across the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import epoch_floor_s, guarded_seq_end
from .registry import query


@query(
    "gapfill_hourly_locf",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1e6 AS sum_value
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hour_start) AS mn, MAX(hour_start) AS mx FROM hourly),
    hours AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ),
    spine AS (
        SELECT t.event_type, h.hour_start
        FROM (SELECT DISTINCT event_type FROM hourly) t, hours h
    ),
    j AS (
        SELECT s.event_type, s.hour_start, hh.n, hh.sum_value
        FROM spine s
        LEFT JOIN hourly hh
          ON hh.event_type = s.event_type AND hh.hour_start = s.hour_start
    )
    SELECT event_type, hour_start,
           COALESCE(n, 0) AS n,
           CAST(n IS NULL AS INT) AS is_gap,
           last_value(sum_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_value_locf
    FROM j
    """,
)
def gapfill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")) / 1e6).alias(
            "sum_value"
        ),
    )
    bounds = hourly.agg(
        F.min("hour_start").alias("mn"), F.max("hour_start").alias("mx")
    )
    # hourly-spine span guarded at 20 years: a corrupt sentinel timestamp
    # (epoch 0 / 9999-12-31) in ONE event would otherwise explode the spine
    # to 70M+ rows (functions.guarded_seq_end, r8 extreme-timestamp corpus)
    n_hours = (F.unix_timestamp("mx") - F.unix_timestamp("mn")) / 3600
    hours = bounds.select(
        F.explode(
            F.sequence(
                "mn",
                guarded_seq_end(F.col("mx"), n_hours, 175_320, "hourly gapfill spine"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start")
    )
    spine = hourly.select("event_type").distinct().crossJoin(F.broadcast(hours))
    j = spine.join(hourly, ["event_type", "hour_start"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.col("n").isNull().cast("int").alias("is_gap"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_locf"),
    )


# --- gap fill: LINEAR interpolation ------------------------------------------
# The companion to LOCF for continuous telemetry (utilization, temperature):
# each gap hour takes the straight line between its bracketing non-null
# anchors; leading/trailing gaps back-/forward-fill to the nearest anchor.
# Same dense spine as gapfill_hourly_locf; the interpolation axis is the
# spine ROW INDEX (the spine is uniform hourly), so the fraction
# (i - i_prev)/(i_next - i_prev) divides exact integers — bit-identical on
# both engines — and the hourly sums are 1e-6-staged BIGINTs, so the final
# interpolated double is deterministic before its own 1e-6 staging. Scale
# shape: one hourly aggregation, a broadcast spine cross join, and two
# windows per event_type partition — no self-join of the series.
@query(
    "gapfill_hourly_linear",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1e6 AS sum_value
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hour_start) AS mn, MAX(hour_start) AS mx FROM hourly),
    hours AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ),
    spine AS (
        SELECT t.event_type, h.hour_start
        FROM (SELECT DISTINCT event_type FROM hourly) t, hours h
    ),
    j AS (
        SELECT s.event_type, s.hour_start, hh.n, hh.sum_value,
               ROW_NUMBER() OVER (
                   PARTITION BY s.event_type ORDER BY s.hour_start
               ) AS i
        FROM spine s
        LEFT JOIN hourly hh
          ON hh.event_type = s.event_type AND hh.hour_start = s.hour_start
    ),
    anch AS (
        SELECT *,
               last_value(sum_value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_v,
               last_value(CASE WHEN sum_value IS NOT NULL THEN i END IGNORE NULLS)
                   OVER (
                   PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_i,
               first_value(sum_value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_v,
               first_value(CASE WHEN sum_value IS NOT NULL THEN i END IGNORE NULLS)
                   OVER (
                   PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_i
        FROM j
    )
    SELECT event_type, hour_start,
           COALESCE(n, 0) AS n,
           CAST(n IS NULL AS INT) AS is_gap,
           CAST(FLOOR(
               CASE WHEN prev_v IS NULL THEN next_v
                    WHEN next_v IS NULL THEN prev_v
                    WHEN next_i = prev_i THEN prev_v
                    ELSE prev_v + (next_v - prev_v)
                         * (CAST(i - prev_i AS DOUBLE)
                            / CAST(next_i - prev_i AS DOUBLE))
               END * 1000000 + 0.5) AS BIGINT) / 1e6 AS sum_value_interp
    FROM anch
    """,
)
def gapfill_hourly_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long"))
            / 1e6
        ).alias("sum_value"),
    )
    bounds = hourly.agg(
        F.min("hour_start").alias("mn"), F.max("hour_start").alias("mx")
    )
    # hourly-spine span guarded at 20 years: a corrupt sentinel timestamp
    # (epoch 0 / 9999-12-31) in ONE event would otherwise explode the spine
    # to 70M+ rows (functions.guarded_seq_end, r8 extreme-timestamp corpus)
    n_hours = (F.unix_timestamp("mx") - F.unix_timestamp("mn")) / 3600
    hours = bounds.select(
        F.explode(
            F.sequence(
                "mn",
                guarded_seq_end(F.col("mx"), n_hours, 175_320, "hourly gapfill spine"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start")
    )
    spine = hourly.select("event_type").distinct().crossJoin(F.broadcast(hours))
    j = spine.join(hourly, ["event_type", "hour_start"], "left").withColumn(
        "i",
        F.row_number().over(W.partitionBy("event_type").orderBy("hour_start")),
    )
    wb = (
        W.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    masked_i = F.when(F.col("sum_value").isNotNull(), F.col("i"))
    anch = j.select(
        "event_type",
        "hour_start",
        "n",
        "i",
        F.last("sum_value", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(masked_i, ignorenulls=True).over(wb).alias("prev_i"),
        F.first("sum_value", ignorenulls=True).over(wf).alias("next_v"),
        F.first(masked_i, ignorenulls=True).over(wf).alias("next_i"),
    )
    frac = (F.col("i") - F.col("prev_i")).cast("double") / (
        F.col("next_i") - F.col("prev_i")
    ).cast("double")
    interp = (
        F.when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_i") == F.col("prev_i"), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return anch.select(
        "event_type",
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.col("n").isNull().cast("int").alias("is_gap"),
        (F.floor(interp * 1_000_000 + F.lit(0.5)).cast("long") / 1e6).alias(
            "sum_value_interp"
        ),
    )


# --- unpivot / melt ----------------------------------------------------------
# The wide->long reshape (df.unpivot, SQL stack()): gold tables are wide per
# metric, monitoring sinks want (key, metric, value) rows. The oracle uses
# UNION ALL — the portable relational spelling of the same operator.
@query(
    "unpivot_flag_measures",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS sum_qty,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sum_price_c,
               SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS sum_disc_c
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, CAST(sum_qty AS DOUBLE) AS amount FROM base
    UNION ALL
    SELECT l_returnflag, 'sum_price_c', CAST(sum_price_c AS DOUBLE) FROM base
    UNION ALL
    SELECT l_returnflag, 'sum_disc_c', CAST(sum_disc_c AS DOUBLE) FROM base
    """,
)
def unpivot_flag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")).alias("sum_qty"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_price_c"
        ),
        F.sum(F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")).alias("sum_disc_c"),
    )
    return base.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price_c", "sum_disc_c"],
        variableColumnName="measure",
        valueColumnName="amount",
    ).withColumn("amount", F.col("amount").cast("double"))


# --- sequential-pattern funnel (view -> click -> purchase) -------------------
# The event-sequence analytics class (MATCH_RECOGNIZE-lite): per user, the
# earliest qualifying event of each stage STRICTLY AFTER the previous stage's
# anchor. Three conditional-min aggregations, each keyed on user_id — the
# exchanges are co-partitioned so AQE/Catalyst reuses the layout, and every
# join input is a per-user 1-row aggregate (broadcast- or merge-friendly),
# never the raw event stream twice. Users who never reach stage 1 are out of
# the funnel by definition.
@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(v.t1 AS TIMESTAMP) AS t1,
           CAST(c.t2 AS TIMESTAMP) AS t2,
           CAST(p.t3 AS TIMESTAMP) AS t3,
           CAST(1 + CAST(c.user_id IS NOT NULL AS INT)
                  + CAST(p.user_id IS NOT NULL AS INT) AS INT) AS stage
    FROM v LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t1",
            "t2",
            "t3",
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            ).cast("int").alias("stage"),
        )
    )


# --- cohort retention (weekly) -----------------------------------------------
# Users cohorted by the week of their first 'signup'; each later week of ANY
# activity marks the cohort retained at that offset. Two aggregations: the
# per-user cohort anchor (user_id-keyed), then the (cohort, offset) distinct
# rollup — the distinct is over (cohort_week, offset, user_id) triples, which
# partial-aggregates map-side before the exchange.
@query(
    "cohort_weekly_retention",
    oracle="""
    WITH s AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT s.cohort_week,
               CAST(date_diff('day', CAST(s.cohort_week AS DATE),
                              CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
                   AS week_offset,
               e.user_id
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE date_trunc('week', e.ts) >= s.cohort_week
    )
    SELECT cohort_week, week_offset,
           COUNT(*) AS n_active
    FROM act GROUP BY cohort_week, week_offset
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    act = (
        ev.join(cohort, "user_id")
        .withColumn("act_week", F.date_trunc("week", "ts"))
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


# --- event-type transition matrix (Markov chain estimation) ------------------
# Per-user event streams ordered by (ts, event_id) — the id tie-break makes
# the sequence deterministic on both engines — lag() pairs each event with
# its predecessor type; one grouped count per (from, to) cell plus the
# row-normalized transition probability. The lag is a single user_id-hash
# partitioned window pass; the cell rollup output is |types|² rows.
@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    cells AS (
        SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    totals AS (SELECT from_type, SUM(n) AS tot FROM cells GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
    FROM cells c JOIN totals t USING (from_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cells = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = W.partitionBy("from_type")
    return (
        cells.withColumn("tot", F.sum("n").over(wt))
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot").cast("double"), 6).alias("p"),
        )
    )


# --- time-weighted average (TWAP) over irregular samples ---------------------
# The hypertable aggregate plain AVG gets wrong on irregular telemetry: each
# sample holds until the next one (last-observation-carried-forward weight),
# the day's last sample holds until midnight. Weights are integer seconds
# (lead() over the per-user day partition), and the weighted sum stays in
# exact integer arithmetic — round(value*1e4)::BIGINT × weight — so the
# result is bit-identical across engines and partitionings. One window pass
# + one rollup, both on the same (user_id, dt) hash layout.
@query(
    "twap_user_daily",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               CAST(floor(epoch(ts)) AS BIGINT) AS es,
               CAST(floor(epoch(COALESCE(
                   LEAD(ts) OVER (
                       PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts, event_id
                   ),
                   date_trunc('day', ts) + INTERVAL 1 DAY))) AS BIGINT) AS ee
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, dt,
           COUNT(*) AS n_samples,
           CAST(SUM(ee - es) AS BIGINT) AS covered_s,
           ROUND((SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) * (ee - es))
                  / 10000.0) / SUM(ee - es), 6) AS twap
    FROM s GROUP BY user_id, dt
    """,
)
def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .filter(F.col("value").isNotNull())
        .withColumn("dt", F.date_trunc("day", "ts"))
    )
    w = W.partitionBy("user_id", "dt").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "dt",
        "value",
        # epoch_floor_s, not unix_timestamp: ts carries sub-second fractions
        # and the oracle floors — trunc is 1s high on pre-epoch rows
        epoch_floor_s("ts").alias("es"),
        epoch_floor_s(
            F.coalesce(
                F.lead("ts").over(w), F.col("dt") + F.expr("INTERVAL 1 DAY")
            )
        ).alias("ee"),
    )
    wsec = F.col("ee") - F.col("es")
    return s.groupBy("user_id", "dt").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(wsec).alias("covered_s"),
        F.round(
            (
                F.sum(
                    F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
                    * wsec
                )
                / 10000.0
            )
            / F.sum(wsec),
            6,
        ).alias("twap"),
    )


# --- telemetry gap detection -------------------------------------------------
# Monitoring primitive: silences longer than GAP_S seconds inside a user's
# event stream (lag over the (ts, event_id)-ordered sequence). One window
# pass; emits only the gap rows.
GAP_S = 6 * 3600


@query(
    "event_gap_detection",
    oracle=f"""
    WITH s AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT user_id,
           CAST(prev_ts AS TIMESTAMP) AS gap_start,
           CAST(ts AS TIMESTAMP) AS gap_end,
           CAST(floor(epoch(ts)) - floor(epoch(prev_ts)) AS BIGINT) AS gap_s
    FROM s
    WHERE prev_ts IS NOT NULL
      AND floor(epoch(ts)) - floor(epoch(prev_ts)) > {GAP_S}
    """,
)
def event_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("prev_ts", F.lag("ts").over(w)).filter(
        F.col("prev_ts").isNotNull()
    )
    gap = epoch_floor_s("ts") - epoch_floor_s("prev_ts")
    return s.filter(gap > GAP_S).select(
        "user_id",
        F.col("prev_ts").alias("gap_start"),
        F.col("ts").alias("gap_end"),
        gap.alias("gap_s"),
    )


# --- gaps-and-islands: longest same-type streak per user ---------------------
# The rk-difference trick: two row_numbers over the (ts, event_id)-ordered
# stream — one global per user, one per (user, type) — differ by a constant
# within each consecutive same-type island, so grouping on the difference
# materializes islands without any self-join or iteration. Two window passes
# over the SAME (user_id) hash layout + one rollup.
@query(
    "longest_event_streak",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk_all,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rk_type
        FROM events
    ),
    islands AS (
        SELECT user_id, event_type, COUNT(*) AS streak
        FROM s GROUP BY user_id, event_type, rk_all - rk_type
    )
    SELECT user_id,
           CAST(MAX(streak) AS BIGINT) AS longest_streak,
           MIN(CASE WHEN streak = ms THEN event_type END) AS streak_type
    FROM (
        SELECT user_id, event_type, streak,
               MAX(streak) OVER (PARTITION BY user_id) AS ms
        FROM islands
    )
    GROUP BY user_id
    """,
)
def longest_event_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    islands = s.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("streak")
    )
    wm = W.partitionBy("user_id")
    return (
        islands.withColumn("ms", F.max("streak").over(wm))
        .groupBy("user_id")
        .agg(
            F.max("streak").alias("longest_streak"),
            F.min(
                F.when(F.col("streak") == F.col("ms"), F.col("event_type"))
            ).alias("streak_type"),
        )
    )


# --- rolling distinct users (DAU / trailing-7-day WAU) -----------------------
# Rolling DISTINCT cannot ride a plain window frame (distinct is not
# decomposable); the scalable exact form first collapses the stream to
# (day, user) pairs — orders of magnitude smaller than events — then counts
# each user once per trailing window via a bounded range join on the day
# spine. Stickiness = DAU/WAU falls out of the same pass. The pair table is
# the only data-sized stage; everything after is days × users-per-week.
@query(
    "rolling_wau_dau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    wau AS (
        SELECT days.d, COUNT(DISTINCT du.user_id) AS wau
        FROM days JOIN du
          ON du.d <= days.d AND du.d > days.d - INTERVAL 7 DAY
        GROUP BY days.d
    ),
    dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d)
    SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
           ROUND(CAST(dau.dau AS DOUBLE)
                 / NULLIF(CAST(wau.wau AS DOUBLE), 0.0), 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
)
def rolling_wau_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    # Equi form of the trailing window: each (day, user) pair serves the 7
    # windows it falls in (a narrow 7x explode of the small pair table), so
    # the spine join is a plain hash semi-join — no nested loop even without
    # relying on the spine being broadcast-small.
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("d"), F.col("d") + F.expr("INTERVAL 6 DAY"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("d"),
        "user_id",
    )
    wau = (
        contrib.join(days, "d", "left_semi")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "d")
        .select(
            "d",
            "dau",
            "wau",
            # symmetric NULLIF guard (all-NULL-key corpus class, round 9):
            # countDistinct skips NULLs, so an all-NULL user_id day has
            # dau >= 1 rows but wau = 0 — stickiness is undefined, NULL in
            # BOTH engines instead of an ANSI divide-by-zero on ours alone
            F.round(
                F.col("dau").cast("double")
                / F.nullif(F.col("wau").cast("double"), F.lit(0.0)),
                6,
            ).alias("stickiness"),
        )
    )


# --- funnel conversion-time statistics ---------------------------------------
# The business readout on top of the funnel: how many viewers convert, and
# how fast. Time-to-convert quantiles are exact interpolated percentiles
# over integer seconds (Spark percentile == DuckDB quantile_cont); the mean
# divides the same BIGINT sum/count on both engines.
@query(
    "funnel_conversion_stats",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    ),
    d AS (
        SELECT v.user_id,
               CAST(floor(epoch(p.t3)) - floor(epoch(v.t1)) AS BIGINT) AS conv_s
        FROM v JOIN p ON p.user_id = v.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewers,
           COUNT(*) AS n_converted,
           -- zero viewers => rate undefined BY CONSTRUCTION on both engines
           CASE WHEN (SELECT COUNT(*) FROM v) > 0 THEN
             ROUND(CAST(COUNT(*) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 6)
           END AS conversion_rate,
           ROUND(quantile_cont(conv_s, 0.5), 6) AS median_conv_s,
           ROUND(quantile_cont(conv_s, 0.9), 6) AS p90_conv_s,
           ROUND(CAST(SUM(conv_s) AS DOUBLE) / COUNT(*), 6) AS avg_conv_s
    FROM d
    """,
)
def funnel_conversion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The viewer denominator stays IN the plan as a broadcast-crossJoined
    # 1-row aggregate (the tpch_heavy idiom) — NOT an eager .count(), which
    # would run a separate job at plan-build time and latch a driver scalar.
    funnel = funnel_view_click_purchase(spark, sf_dir)
    nv = funnel.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_viewers"))
    d = funnel.filter(F.col("t3").isNotNull()).select(
        (epoch_floor_s("t3") - epoch_floor_s("t1")).alias("conv_s")
    )
    return (
        d.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile("conv_s", F.lit(0.5)), 6).alias("median_conv_s"),
            F.round(F.percentile("conv_s", F.lit(0.9)), 6).alias("p90_conv_s"),
            F.round(F.sum("conv_s").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_conv_s"
            ),
        )
        .crossJoin(F.broadcast(nv))
        .select(
            "n_viewers",
            "n_converted",
            F.when(
                F.col("n_viewers") > 0,
                F.round(
                    F.col("n_converted").cast("double")
                    / F.col("n_viewers").cast("double"),
                    6,
                ),
            ).alias("conversion_rate"),
            "median_conv_s",
            "p90_conv_s",
            "avg_conv_s",
        )
    )


# --- clickstream path mining (top 3-step paths) ------------------------------
# The "what do users do next" readout: every consecutive 3-event path per
# user ((ts, event_id)-ordered lag pairs), counted corpus-wide, top 20 by
# frequency with deterministic ties. One window pass over the user-hash
# layout; the path rollup is |types|³ cells at most.
@query(
    "top_event_paths",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               LAG(event_type, 1) OVER w AS p1,
               LAG(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path, COUNT(*) AS n
        FROM s WHERE p2 IS NOT NULL
        GROUP BY 1
    )
    SELECT path, n FROM paths ORDER BY n DESC, path LIMIT 20
    """,
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        ev.withColumn("p1", F.lag("event_type", 1).over(w))
        .withColumn("p2", F.lag("event_type", 2).over(w))
        .filter(F.col("p2").isNotNull())
    )
    return (
        s.groupBy(
            F.concat_ws(" > ", "p2", "p1", "event_type").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# --- weekday seasonality profile ---------------------------------------------
# Seasonal baseline + deviation: each (type, day) cell vs its ISO-weekday
# baseline mean — the day-of-week decomposition a capacity planner reads
# before calling a dip an anomaly. All means divide the same exact
# scaled-long sums; the weekday baseline joins back broadcast.
@query(
    "weekday_seasonality",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
               CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    base AS (
        SELECT event_type, dow,
               CAST(SUM(s) AS BIGINT) AS bs, CAST(SUM(n) AS BIGINT) AS bn
        FROM d GROUP BY event_type, dow
    )
    SELECT d.event_type, d.dt, d.dow,
           ROUND(CAST(d.s AS DOUBLE) / 1000000.0 / d.n, 6) AS day_mean,
           ROUND(CAST(base.bs AS DOUBLE) / 1000000.0 / base.bn, 6) AS weekday_baseline,
           ROUND(CAST(d.s AS DOUBLE) / 1000000.0 / d.n
                 - CAST(base.bs AS DOUBLE) / 1000000.0 / base.bn, 6) AS deviation
    FROM d JOIN base USING (event_type, dow)
    """,
)
def weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("day", "ts").alias("dt"),
            (F.weekday("ts") + 1).cast("long").alias("dow"),
            "value",
        )
    )
    d = ev.groupBy("event_type", "dt", "dow").agg(
        F.sum(F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    base = d.groupBy("event_type", "dow").agg(
        F.sum("s").alias("bs"), F.sum("n").alias("bn")
    )
    day_mean = F.col("s").cast("double") / 1000000.0 / F.col("n")
    base_mean = F.col("bs").cast("double") / 1000000.0 / F.col("bn")
    return (
        d.join(F.broadcast(base), ["event_type", "dow"])
        .select(
            "event_type",
            "dt",
            "dow",
            F.round(day_mean, 6).alias("day_mean"),
            F.round(base_mean, 6).alias("weekday_baseline"),
            F.round(day_mean - base_mean, 6).alias("deviation"),
        )
    )


# --- growth accounting: new vs returning users per day -----------------------
# The daily growth ledger: actives split into first-ever-seen (new) and
# returning. The (day, user) pair collapse is the only data-sized stage;
# each user's first day is one more aggregation joined back on user_id.
@query(
    "daily_new_vs_returning",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
        FROM events
    ),
    first_day AS (SELECT user_id, MIN(d) AS fd FROM du GROUP BY user_id)
    SELECT du.d,
           COUNT(*) AS n_active,
           CAST(SUM(CASE WHEN du.d = f.fd THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN du.d > f.fd THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
    FROM du JOIN first_day f ON f.user_id = du.user_id
    GROUP BY du.d
    """,
)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.date_trunc("day", "ts").alias("d"), "user_id").distinct()
    first_day = du.groupBy("user_id").agg(F.min("d").alias("fd"))
    return (
        du.join(first_day, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.when(F.col("d") == F.col("fd"), 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("d") > F.col("fd"), 1).otherwise(0)).alias(
                "n_returning"
            ),
        )
    )


# --- additive trend + weekday-seasonality forecast ---------------------------
# 7-day-ahead daily event-count forecast per type: OLS linear trend over the
# observed day index plus an additive ISO-weekday offset (mean residual per
# weekday) — the classic decomposition baseline a capacity planner runs
# before reaching for real models. Everything reduces to the (type × day)
# daily table after one aggregation; trend moments and weekday offsets are
# exact scaled-long sums, and the forecast rows are generated from a
# row-local sequence (no data scan for the future spine).
@query(
    "forecast_daily_events",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, d, y,
               CAST(date_diff('day', MIN(d) OVER (PARTITION BY event_type), d)
                    AS DOUBLE) AS x,
               MAX(d) OVER (PARTITION BY event_type) AS last_d
        FROM daily
    ),
    fit AS (
        SELECT event_type, MAX(last_d) AS last_d, COUNT(*) AS n,
               SUM(CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS sx,
               SUM(CAST(FLOOR(CAST(y AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
                   / 1000000.0 AS sy,
               SUM(CAST(FLOOR(x * x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0 AS sxx,
               SUM(CAST(FLOOR(x * CAST(y AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
                   / 1000000.0 AS sxy,
               MAX(x) AS max_x
        FROM idx GROUP BY 1
    ),
    coef AS (
        SELECT event_type, last_d, max_x,
               (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS slope,
               (sy - ((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)) * sx)
                   / n AS intercept
        FROM fit
    ),
    seas AS (
        SELECT i.event_type, isodow(i.d) AS wd,
               SUM(CAST(FLOOR((CAST(i.y AS DOUBLE)
                    - (c.intercept + c.slope * i.x)) * 1000000.0 + 0.5) AS BIGINT))
                   / 1000000.0 / COUNT(*) AS offset
        FROM idx i JOIN coef c USING (event_type)
        GROUP BY 1, 2
    ),
    future AS (
        SELECT c.event_type, c.last_d, c.max_x, c.slope, c.intercept,
               unnest(range(1, 8)) AS h
        FROM coef c
    )
    SELECT f.event_type,
           f.last_d + to_days(CAST(f.h AS INT)) AS forecast_day,
           ROUND(f.intercept + f.slope * (f.max_x + f.h)
                 + COALESCE(s.offset, 0.0), 4) AS forecast
    FROM future f
    LEFT JOIN seas s
      ON s.event_type = f.event_type
     AND s.wd = isodow(f.last_d + to_days(CAST(f.h AS INT)))
    """,
)
def forecast_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions import exact_sum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = W.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "d",
        "y",
        F.datediff(F.col("d"), F.min("d").over(w)).cast("double").alias("x"),
        F.max("d").over(w).alias("last_d"),
    )
    fit = idx.groupBy("event_type").agg(
        F.max("last_d").alias("last_d"),
        F.count(F.lit(1)).alias("n"),
        exact_sum("x", scale=6).alias("sx"),
        exact_sum(F.col("y").cast("double"), scale=6).alias("sy"),
        exact_sum(F.col("x") * F.col("x"), scale=6).alias("sxx"),
        exact_sum(F.col("x") * F.col("y").cast("double"), scale=6).alias("sxy"),
        F.max("x").alias("max_x"),
    )
    # NULLIF: a type whose observations all share one x (single active day)
    # has zero OLS variance — ANSI Spark would raise DIVIDE_BY_ZERO where
    # DuckDB diverges; NULL slope/forecast on both engines instead
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    coef = fit.select(
        "event_type",
        "last_d",
        "max_x",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )
    resid = (
        F.col("y").cast("double")
        - (F.col("intercept") + F.col("slope") * F.col("x"))
    )
    seas = (
        idx.join(F.broadcast(coef), "event_type")
        .groupBy("event_type", F.expr("extract(dayofweek_iso FROM d)").alias("wd"))
        .agg((exact_sum(resid, scale=6) / F.count(F.lit(1))).alias("offset"))
    )
    future = coef.select(
        "event_type",
        "last_d",
        "max_x",
        "slope",
        "intercept",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"),
    ).withColumn("forecast_day", F.expr("last_d + make_interval(0,0,0,h)"))
    fut = future.alias("fut")
    se = seas.select(
        F.col("event_type").alias("s_event_type"), "wd", "offset"
    ).alias("se")
    return (
        fut.join(
            F.broadcast(se),
            (F.col("fut.event_type") == F.col("se.s_event_type"))
            & (
                F.col("se.wd")
                == F.expr("extract(dayofweek_iso FROM forecast_day)")
            ),
            "left",
        )
        .select(
            F.col("fut.event_type").alias("event_type"),
            "forecast_day",
            F.round(
                F.col("intercept")
                + F.col("slope") * (F.col("max_x") + F.col("h"))
                + F.coalesce(F.col("offset"), F.lit(0.0)),
                4,
            ).alias("forecast"),
        )
    )


# --- marketing-style last-touch attribution ----------------------------------
# Attribute each purchase to the user's most recent PRECEDING non-purchase
# event within a 7-day lookback — the last-touch model every growth team
# starts from. One window pass over the user-partitioned, (ts, event_id)-
# ordered stream: carry the latest non-purchase (ts, type) forward with a
# last_value(ignore nulls) frame, emit attributions at purchase rows, then
# roll up by attributed channel. The ordering key is total (event_id ties),
# so both engines replay the identical carry.
@query(
    "attribution_last_touch",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_type,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_ts
        FROM events
    ),
    attributed AS (
        SELECT CASE WHEN prev_ts IS NOT NULL
                     AND ts - prev_ts <= INTERVAL 7 DAY
                    THEN prev_type ELSE 'unattributed' END AS channel
        FROM ordered WHERE event_type = 'purchase'
    )
    SELECT channel, COUNT(*) AS purchases FROM attributed GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    np_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    np_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    ordered = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.last(np_type, ignorenulls=True).over(w).alias("prev_type"),
        F.last(np_ts, ignorenulls=True).over(w).alias("prev_ts"),
    )
    attributed = ordered.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("prev_ts").isNotNull()
            & (F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 7 DAY")),
            F.col("prev_type"),
        )
        .otherwise("unattributed")
        .alias("channel")
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("purchases")
    )


# --- rolling cross-correlation of two event series ---------------------------
# 7-day trailing Pearson correlation between the daily click and purchase
# counts — the co-movement diagnostic behind "do conversions track traffic
# this week?". Counts are exact BIGINTs, so every frame moment (sums,
# squares, cross products) is exact integer arithmetic; the correlation is
# one double expression over identical ints on both engines. The window
# orders only the day-spine-sized pivot (bounded), not the event stream.
@query(
    "rolling_corr_click_purchase",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT d, x, y,
               COUNT(*)  OVER w AS n,
               SUM(x)    OVER w AS sx,
               SUM(y)    OVER w AS sy,
               SUM(x*x)  OVER w AS sxx,
               SUM(y*y)  OVER w AS syy,
               SUM(x*y)  OVER w AS sxy
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d, x AS clicks, y AS purchases, CAST(n AS BIGINT) AS n_days,
           CASE WHEN n >= 3
                 AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                THEN ROUND((CAST(n*sxy - sx*sy AS DOUBLE))
                     / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                        * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
           END AS corr7
    FROM m
    """,
)
def rolling_corr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    m = daily.select(
        "d",
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return m.select(
        "d",
        F.col("x").alias("clicks"),
        F.col("y").alias("purchases"),
        F.col("n").cast("long").alias("n_days"),
        F.when(
            (F.col("n") >= 3) & (vx > 0) & (vy > 0),
            F.round(
                num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 6
            ),
        ).alias("corr7"),
    )


# --- Kaplan-Meier survival over order fulfillment ----------------------------
# Product-limit estimator of "time until an order fully ships", with open
# ('O') orders right-censored at the corpus horizon: at each distinct event
# time t, S(t) *= (1 - d_t / n_t) where n_t = subjects still at risk. The
# cumulative product is exp(Σ ln(·)) over a window ordered by t — the
# (bounded) distinct-duration table, never raw rows. Every factor divides
# identical BIGINTs, and ln/exp are pure double functions of them; the sum
# stages through scaled longs so partial order cannot drift S(t).
@query(
    "kaplan_meier_fulfillment",
    oracle="""
    WITH horizon AS (SELECT MAX(l_shipdate) AS hz FROM lineitem),
    subj AS (
        SELECT o.o_orderkey,
               CASE WHEN o.o_orderstatus = 'O'
                    THEN date_diff('day', o.o_orderdate, hz.hz)
                    ELSE date_diff('day', o.o_orderdate, MAX(l.l_shipdate))
               END AS t,
               CASE WHEN o.o_orderstatus = 'O' THEN 0 ELSE 1 END AS observed
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        CROSS JOIN horizon hz
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus, hz.hz
    ),
    tot AS (SELECT COUNT(*) AS n0 FROM subj),
    at_t AS (
        SELECT t,
               CAST(SUM(observed) AS BIGINT) AS d,
               COUNT(*) AS leaving
        FROM subj GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               n0 - COALESCE(SUM(leaving) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_at_risk
        FROM at_t CROSS JOIN tot
    )
    SELECT t AS days, d AS events, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           ROUND(exp(SUM(CAST(FLOOR(ln(1.0 - CAST(d AS DOUBLE)
                                          / CAST(n_at_risk AS DOUBLE))
                                    * 1000000000.0 + 0.5) AS BIGINT))
                     OVER (ORDER BY t) / 1000000000.0), 6) AS survival
    FROM risk
    WHERE d > 0 AND n_at_risk > d
    """,
)
def kaplan_meier_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    horizon = li.groupBy().agg(F.max("l_shipdate").alias("hz"))
    subj = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .crossJoin(F.broadcast(horizon))
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus", "hz")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.when(
                F.col("o_orderstatus") == "O",
                F.datediff("hz", "o_orderdate"),
            )
            .otherwise(F.datediff("last_ship", "o_orderdate"))
            .alias("t"),
            F.when(F.col("o_orderstatus") == "O", 0).otherwise(1).alias(
                "observed"
            ),
        )
    )
    tot = subj.groupBy().agg(F.count(F.lit(1)).alias("n0"))
    at_t = subj.groupBy("t").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    wprev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = at_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n0")
            - F.coalesce(F.sum("leaving").over(wprev), F.lit(0))
        ).alias("n_at_risk"),
    )
    wcum = W.orderBy("t")
    lnterm = F.log(
        1.0 - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
    )
    surv = F.exp(
        F.sum(F.floor(lnterm * 1_000_000_000.0 + F.lit(0.5)).cast("long")).over(wcum)
        / 1e9
    )
    return risk.select(
        F.col("t").alias("days"),
        F.col("d").alias("events"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.round(surv, 6).alias("survival"),
    ).filter((F.col("events") > 0) & (F.col("n_at_risk") > F.col("events")))


# --- sweep-line peak concurrency ---------------------------------------------
# How many orders are simultaneously "in flight" (orderdate -> last ship)
# per day, via the classic sweep: +1 at start, -1 after end, running sum
# over the (bounded) day-level delta table. The peak and its day answer the
# capacity question without ever joining intervals pairwise — O(n) deltas,
# one bounded-window pass, vs the O(n²) interval self-join it replaces.
@query(
    "peak_concurrent_orders",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS s,
               CAST(MAX(l.l_shipdate) AS DATE) AS e
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    deltas AS (
        SELECT s AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT e + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
        SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY 1
    ),
    running AS (
        SELECT d, SUM(delta) OVER (ORDER BY d) AS open_orders FROM daily
    )
    SELECT CAST(d AS TIMESTAMP) AS day,
           CAST(open_orders AS BIGINT) AS open_orders,
           CAST(RANK() OVER (ORDER BY open_orders DESC, d) AS INT) AS peak_rank
    FROM running
    QUALIFY peak_rank <= 10
    """,
)
def peak_concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
    )
    deltas = spans.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.date_add(F.col("e"), 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("long").alias("delta"))
    running = daily.select(
        "d", F.sum("delta").over(W.orderBy("d")).alias("open_orders")
    )
    w = W.orderBy(F.col("open_orders").desc(), F.col("d"))
    return (
        running.withColumn("peak_rank", F.rank().over(w).cast("int"))
        .filter(F.col("peak_rank") <= 10)
        .select(
            F.col("d").cast("timestamp").alias("day"),
            F.col("open_orders").cast("long").alias("open_orders"),
            "peak_rank",
        )
    )


# --- clamped running balance (Lindley recursion via reflection identity) -----
# balance_i = max(0, balance_{i-1} + delta_i) looks like it needs a
# sequential scan (and most engines ship it as an imperative UDF), but the
# Lindley solution W_n = S_n - min(0, min_{k<=n} S_k) turns it into TWO
# ordinary windows (running sum + running min) — fully parallel per key.
# The oracle executes the LITERAL sequential recursion (recursive CTE), so
# the hash match proves the closed form, not just reimplements it. Deltas
# are scaled to integer cents: both formulations then do exact integer
# arithmetic and must agree bit-for-bit, which float accumulation order
# would not.
@query(
    "clamped_balance_users",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id, event_id,
               CAST(FLOOR(CASE WHEN event_type IN ('purchase','signup')
                    THEN value ELSE -value END * 100 + 0.5) AS BIGINT) AS delta,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE value IS NOT NULL
    ),
    bal AS (
        SELECT user_id, rn, GREATEST(delta, 0) AS b FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.rn, GREATEST(b.b + s.delta, 0)
        FROM seq s JOIN bal b ON b.user_id = s.user_id AND s.rn = b.rn + 1
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN rn = mx THEN b END) AS BIGINT) AS final_cents,
           CAST(MAX(b) AS BIGINT) AS peak_cents
    FROM (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS mx FROM bal)
    GROUP BY user_id ORDER BY user_id
    """,
)
def clamped_balance_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    delta = F.round(
        F.when(
            F.col("event_type").isin("purchase", "signup"), F.col("value")
        ).otherwise(-F.col("value"))
        * 100,
        0,
    ).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    rows = ev.select("user_id", "ts", "event_id", delta.alias("delta")).select(
        "user_id",
        "ts",
        "event_id",
        F.sum("delta").over(w).alias("s"),
    )
    b = F.col("s") - F.least(
        F.lit(0).cast("long"), F.min("s").over(w)
    )
    per_row = rows.select("user_id", "ts", "event_id", b.alias("b"))
    wo = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        per_row.withColumn("rk", F.row_number().over(wo))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rk") == 1, F.col("b"))).alias("final_cents"),
            F.max("b").alias("peak_cents"),
        )
        .orderBy("user_id")
    )


# --- exponential smoothing (exact recursion) ---------------------------------
# The classic monitoring smoother: ewma_d = a*x_d + (1-a)*ewma_{d-1}. The
# recursion looks inherently sequential, but the state space is the DAILY
# rollup (bounded days x event types), so the parallel form is: rollup the
# raw events (the only big-data pass, map-side combinable), then fold the
# tiny per-type day series row-locally. alpha = 0.5 keeps every multiply an
# EXACT binary scaling, so both engines perform the same multiply-exact /
# add-once-rounded sequence and the smoothed series is bit-identical: the
# Spark side folds the sorted prefix with F.aggregate; the oracle executes
# the LITERAL recursion (WITH RECURSIVE), so the hash match proves the
# windowed-fold rewrite equals the sequential definition. Complements
# pipeline_ops.ewma_daily_value (the 8-day-truncated dyadic-weight window):
# this one carries the FULL infinite-memory state per event type.
@query(
    "ewma_recursive_daily",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1e6)
                   / COUNT(value) AS x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY date_trunc('day', ts)) AS rn
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    sm AS (
        SELECT event_type, rn, d, x, x AS ewma FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.d, s.x, 0.5 * s.x + 0.5 * p.ewma
        FROM seq s JOIN sm p ON p.event_type = s.event_type AND s.rn = p.rn + 1
    )
    SELECT event_type, d, ROUND(x, 6) AS daily_mean, ROUND(ewma, 6) AS ewma
    FROM sm ORDER BY event_type, d
    """,
)
def ewma_recursive_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long"))
            / F.lit(1e6)
            / F.count("value")
        ).alias("x")
    )
    # whole-partition sorted series (sort_array makes collect order moot),
    # per-row prefix fold: acc==NULL seeds with the first observation
    w_full = W.partitionBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    w_ord = W.partitionBy("event_type").orderBy("d")
    xs = F.transform(
        F.sort_array(F.collect_list(F.struct("d", "x")).over(w_full)),
        lambda s: s["x"],
    )
    rn = F.row_number().over(w_ord)
    ewma = F.aggregate(
        F.slice(xs, F.lit(1), rn),
        F.lit(None).cast("double"),
        lambda acc, v: F.when(acc.isNull(), v).otherwise(0.5 * v + 0.5 * acc),
    )
    return (
        daily.select(
            "event_type",
            "d",
            F.round("x", 6).alias("daily_mean"),
            F.round(ewma, 6).alias("ewma"),
        )
        .orderBy("event_type", "d")
    )


# --- Holt linear-trend smoothing ---------------------------------------------
# Double exponential smoothing (level + trend), alpha = beta = 0.5:
#   l_n = 0.5*x_n + 0.5*(l_{n-1} + b_{n-1});  b_n = 0.5*(l_n - l_{n-1}) + 0.5*b_{n-1}
# seeded l_1 = x_1, b_1 = 0. Same parallel shape as ewma_daily_value (big
# rollup, then a row-local fold over the bounded day series — here a struct
# accumulator carrying (level, trend)); the oracle again runs the literal
# two-state recursion, proving the fold. Emits the fitted end state and the
# one-step-ahead forecast per event type.
@query(
    "holt_linear_daily",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               (SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1e6)
                   / COUNT(value) AS x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY date_trunc('day', ts)) AS rn
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    st AS (
        -- CAST: DuckDB pins recursive-CTE column types from the ANCHOR
        -- branch; a bare 0.0 is DECIMAL(2,1) and would round the trend
        -- state to one decimal on every iteration
        SELECT event_type, rn, d, x AS l, CAST(0 AS DOUBLE) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.d,
               0.5 * s.x + 0.5 * (p.l + p.b),
               0.5 * ((0.5 * s.x + 0.5 * (p.l + p.b)) - p.l) + 0.5 * p.b
        FROM seq s JOIN st p ON p.event_type = s.event_type AND s.rn = p.rn + 1
    ),
    fin AS (
        SELECT event_type, rn, d, l, b,
               MAX(rn) OVER (PARTITION BY event_type) AS mx
        FROM st
    )
    SELECT event_type, CAST(mx AS BIGINT) AS n_days, d AS last_day,
           ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
           ROUND(l + b, 6) AS forecast_next
    FROM fin WHERE rn = mx ORDER BY event_type
    """,
)
def holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long"))
            / F.lit(1e6)
            / F.count("value")
        ).alias("x")
    )
    per_type = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("d").alias("last_day"),
        F.sort_array(F.collect_list(F.struct("d", "x"))).alias("xs"),
    )
    init = F.struct(
        F.lit(None).cast("double").alias("l"), F.lit(None).cast("double").alias("b")
    )

    def step(acc, s):
        v = s["x"]
        l_new = 0.5 * v + 0.5 * (acc["l"] + acc["b"])
        b_new = 0.5 * (l_new - acc["l"]) + 0.5 * acc["b"]
        return F.when(
            acc["l"].isNull(),
            F.struct(v.alias("l"), F.lit(0.0).alias("b")),
        ).otherwise(F.struct(l_new.alias("l"), b_new.alias("b")))

    fit = F.aggregate(F.col("xs"), init, step)
    return (
        per_type.select(
            "event_type",
            "n_days",
            "last_day",
            F.round(fit["l"], 6).alias("level"),
            F.round(fit["b"], 6).alias("trend"),
            F.round(fit["l"] + fit["b"], 6).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


# --- position-based (U-shaped) multi-touch attribution -----------------------
# The 40/20/40 rule: each purchase splits its credit over the non-purchase
# touches in its 7-day lookback — 40% first touch, 40% last, the middle 20%
# spread evenly; 1 touch takes all, 2 touches split evenly, no touches fall
# to 'unattributed' (so total credit == total purchases, the conservation
# property last-touch lacks). Shape: per-user bounded range join (purchase x
# trailing-week touches) + one purchase-keyed window for (rank, k) + one
# channel rollup. Every weight literal is a DOUBLE on both engines (a bare
# 0.2 is DECIMAL in DuckDB and its division semantics diverge); the credit
# sum stages through round(w*1e9) scaled longs, so partial-agg order is
# irrelevant.
@query(
    "attribution_position_based",
    oracle="""
    WITH p AS (
        SELECT user_id, ts AS ts_p, event_id AS eid_p
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts AS ts_t, event_id AS eid_t, event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
        SELECT p.eid_p, t.ts_t, t.eid_t, t.channel
        FROM p LEFT JOIN t
          ON t.user_id = p.user_id
         AND t.ts_t < p.ts_p
         AND t.ts_t >= p.ts_p - INTERVAL 7 DAY
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY eid_p ORDER BY ts_t, eid_t) AS rn,
               COUNT(ts_t) OVER (PARTITION BY eid_p) AS k
        FROM j
    ),
    w AS (
        SELECT COALESCE(channel, 'unattributed') AS channel, ts_t,
               CASE WHEN k <= 1 THEN 1.0e0
                    WHEN k = 2 THEN 0.5e0
                    WHEN rn = 1 OR rn = k THEN 0.4e0
                    ELSE 0.2e0 / (k - 2) END AS wt
        FROM r
    )
    SELECT channel,
           CAST(COUNT(ts_t) AS BIGINT) AS n_touches,
           SUM(CAST(FLOOR(wt * 1e9 + 0.5) AS BIGINT)) / 1e9 AS credit
    FROM w GROUP BY channel ORDER BY channel
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts_p"), F.col("event_id").alias("eid_p")
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("u_t"),
        F.col("ts").alias("ts_t"),
        F.col("event_id").alias("eid_t"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("u_t") == F.col("user_id"))
        & (F.col("ts_t") < F.col("ts_p"))
        & (F.col("ts_t") >= F.col("ts_p") - F.expr("INTERVAL 7 DAY")),
        "left",
    ).select("eid_p", "ts_t", "eid_t", "channel")
    wp = W.partitionBy("eid_p")
    r = j.select(
        "channel",
        "ts_t",
        F.row_number().over(wp.orderBy("ts_t", "eid_t")).alias("rn"),
        F.count("ts_t").over(wp).alias("k"),
    )
    wt = (
        F.when(F.col("k") <= 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
    )
    w = r.select(
        F.coalesce("channel", F.lit("unattributed")).alias("channel"),
        "ts_t",
        wt.alias("wt"),
    )
    return (
        w.groupBy("channel")
        .agg(
            F.count("ts_t").cast("long").alias("n_touches"),
            (F.sum(F.floor(F.col("wt") * 1e9 + F.lit(0.5)).cast("long")) / F.lit(1e9)).alias(
                "credit"
            ),
        )
        .orderBy("channel")
    )


# --- isotonic regression (monotone calibration) -------------------------------
# Weighted isotonic fit of the daily mean value over time, per event type —
# the PAVA result computed by the closed-form minimax identity
#   fitted[i] = max_{j<=i} min_{k>=i} weighted_avg(y[j..k])
# instead of the inherently sequential pool-adjacent-violators loop. The
# distributed shape: the 100 TB events scan collapses to ONE map-side-partial
# daily aggregation (exact scaled-long sums); everything after runs on the
# bounded day series (n = distinct days, <=365/yr), so the O(n^2) range
# enumeration is a few-thousand-row self-join per type no matter the corpus
# size. Range sums come from prefix-sum differences (exact BIGINTs), the
# reverse running MIN and the per-day MAX are plain windows/aggs, and every
# division is one IEEE BIGINT/BIGINT->double op — bit-identical on both
# engines by construction. This is the model-calibration primitive
# (isotonic/monotone calibration of scores) expressed as a query.
@query(
    "isotonic_daily_value",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS s,
               COUNT(value) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type, d, s, c,
               ROW_NUMBER() OVER w AS rn,
               SUM(s) OVER w AS cums,
               SUM(c) OVER w AS cumc
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    pairs AS (
        SELECT a.event_type, a.rn AS j, b.rn AS k,
               CAST(b.cums - a.cums + a.s AS DOUBLE)
                   / CAST(b.cumc - a.cumc + a.c AS DOUBLE) AS avg_jk
        FROM seq a JOIN seq b
          ON b.event_type = a.event_type AND b.rn >= a.rn
    ),
    mins AS (
        SELECT event_type, j, k,
               MIN(avg_jk) OVER (PARTITION BY event_type, j
                                 ORDER BY k DESC) AS m_ji
        FROM pairs
    ),
    fit AS (
        SELECT event_type, k AS rn, MAX(m_ji) AS fit
        FROM mins GROUP BY 1, 2
    )
    SELECT s.event_type, s.d,
           FLOOR((CAST(s.s AS DOUBLE) / 1e6 / s.c) * 1e6 + 0.5) / 1e6
               AS daily_mean,
           -- avg_jk runs over the 1e6-scaled daily sums, so fit is already
           -- mean*1e6: one floor(+0.5) both rounds to 6dp and unscales
           FLOOR(f.fit + 0.5) / 1e6 AS fitted_value
    FROM seq s JOIN fit f
      ON f.event_type = s.event_type AND f.rn = s.rn
    ORDER BY s.event_type, s.d
    """,
)
def isotonic_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")).alias("s"),
        F.count("value").alias("c"),
    )
    w = W.partitionBy("event_type").orderBy("d")
    seq = daily.select(
        "event_type",
        "d",
        "s",
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("s").over(w).alias("cums"),
        F.sum("c").over(w).alias("cumc"),
    ).localCheckpoint(eager=False)  # bounded day series, three consumers
    a, b = seq.alias("a"), seq.alias("b")
    # range sum over [j..k] = cums[k] - cums[j] + s[j] (prefix difference),
    # exact BIGINT; ONE double division per pair keeps both engines IEEE-equal
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.rn") >= F.col("a.rn")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.rn").alias("j"),
        F.col("b.rn").alias("k"),
        (
            (F.col("b.cums") - F.col("a.cums") + F.col("a.s")).cast("double")
            / (F.col("b.cumc") - F.col("a.cumc") + F.col("a.c")).cast("double")
        ).alias("avg_jk"),
    )
    # reverse running MIN over k (frame: k' >= k) gives m(j,i); the per-day
    # MAX over j <= i is exactly the groupBy below because pairs only exist
    # for j <= k
    w_rev = W.partitionBy("event_type", "j").orderBy(F.col("k").desc())
    mins = pairs.select(
        "event_type", "j", "k", F.min("avg_jk").over(w_rev).alias("m_ji")
    )
    fit = mins.groupBy("event_type", F.col("k").alias("rn")).agg(
        F.max("m_ji").alias("fit")
    )
    return (
        seq.join(fit, ["event_type", "rn"])
        .select(
            "event_type",
            "d",
            (
                F.floor((F.col("s").cast("double") / 1e6 / F.col("c")) * 1e6 + 0.5)
                / 1e6
            ).alias("daily_mean"),
            (F.floor(F.col("fit") + F.lit(0.5)) / 1e6).alias("fitted_value"),
        )
        .orderBy("event_type", "d")
    )

"""The reference's named future-work marts (reference README.md:546-553):

- ``gold_job_efficiency_daily`` — GPU-hours allocated vs actively used,
  efficiency per job, daily.
- ``gold_user_gpu_usage_daily`` — per-user GPU-hours, job counts, failure
  rates, daily.

The driver testdata has no job-telemetry tables, so the job dimension is
SIMULATED deterministically from ``orders`` (FIXTURES.md mapping: orders play
jobs) and re-anchored into the events time range: start/duration/gpus/outcome
are pure integer functions of (o_orderkey, o_orderdate), reproduced verbatim
in the DuckDB oracle, so the differential check stays exact. ``events`` plays
the utilization telemetry (value clamped to [0,100] as util%), linked to jobs
by user + time overlap — the jobs[start,end) × metrics.ts interval join the
reference could never run single-node at scale.

Scale shape: the metrics⋈jobs join carries the ``user_id`` equi key, so it
plans as a plain shuffled/broadcast hash join with the time predicate
evaluated inside — never a nested-loop. The day explode is a narrow op
(jobs span ~1-2 days each); per-(job,day) and per-(user,day) rollups are
single hash aggregations. At 100 TB the jobs dim is orders of magnitude
smaller than telemetry; Catalyst/AQE broadcasts it and the telemetry table
is read exactly once per mart.

The warehouse (medallion) versions of these marts over the reference's own
schema live in models.py; these registry twins are the hard-signal surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_input
from ..functions import exact_avg
from .registry import query

# 2024-01-01 00:00:00 UTC — the driver events table's month.
_BASE_S = 1704067200
_SPAN_S = 28 * 86400  # jobs start within the first 28 days of the month
_STRIDE = 3607  # prime stride spreading same-date orders across the span

# Broadcast the jobs dim only below this row count. ~48 bytes/row serialized
# puts 5M rows at ~250 MB — comfortably inside executor broadcast memory and
# the 1 GiB spark.driver.maxResultSize the r9 sf100 run saw an unconditional
# broadcast exceed (jobs is a projection of orders, so it scales WITH the
# fact table: 1.5M rows at sf1, 150M at sf100). Above the gate the join
# falls back to the day-bucketed shuffle plan (see gold_job_efficiency_daily).
_BROADCAST_JOBS_MAX = 5_000_000

# Oracle-side jobs dimension — MUST stay the integer-for-integer mirror of
# ``sim_jobs`` below. DuckDB make_timestamp(micros) == Spark
# timestamp_seconds(s) at session-UTC for naive timestamps.
JOBS_SQL = f"""
    nu AS (SELECT COALESCE(MAX(user_id) + 1, 1) AS n_users FROM events),
    jobs AS (
        SELECT o_orderkey AS job_id,
               o_custkey % n_users AS user_id,
               o_orderkey % 8 + 1 AS gpus,
               make_timestamp((
                   {_BASE_S} + (CAST(epoch(o_orderdate) AS BIGINT)
                                + o_orderkey * {_STRIDE}) % {_SPAN_S}
               ) * 1000000) AS start_ts,
               make_timestamp((
                   {_BASE_S} + (CAST(epoch(o_orderdate) AS BIGINT)
                                + o_orderkey * {_STRIDE}) % {_SPAN_S}
                   + (o_orderkey % 96 + 1) * 1800
               ) * 1000000) AS end_ts,
               (o_orderstatus = 'P' OR o_orderkey % 10 = 0) AS failed
        FROM orders, nu
    ),
    job_days AS (
        SELECT j.*, CAST(d AS TIMESTAMP) AS dt,
               CAST(least(epoch(end_ts), epoch(d + INTERVAL 1 DAY))
                    - greatest(epoch(start_ts), epoch(d)) AS BIGINT)
                   AS overlap_s
        FROM jobs j,
             LATERAL unnest(generate_series(
                 date_trunc('day', start_ts),
                 date_trunc('day', end_ts - INTERVAL 1 MICROSECOND),
                 INTERVAL 1 DAY)) t(d)
    )
"""


_N_USERS_MEMO: dict[str, int] = {}


def _n_users(spark: SparkSession, sf_dir: str) -> int:
    """User-domain cardinality of the events telemetry, memoized per dataset:
    it is a property of the immutable testdata, and both marts (×2 bench
    passes each) would otherwise re-run the same single-column max scan as a
    blocking driver action on every query construction."""
    if sf_dir not in _N_USERS_MEMO:
        ev = load_table(spark, sf_dir, "events")
        m = ev.agg(F.max("user_id")).first()[0]
        # empty telemetry => a 1-user domain (mirrors the oracle's
        # COALESCE(MAX+1, 1)), never None+1 / a modulo-by-zero downstream
        _N_USERS_MEMO[sf_dir] = (m + 1) if m is not None else 1
    return _N_USERS_MEMO[sf_dir]


def sim_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic simulated job dimension (see module docstring).

    The user-domain cardinality is fetched as ONE driver-side scalar (a
    single-column max over events) instead of an inline 1-row-aggregate
    cross join: each DataFrame referencing the dim would otherwise replan —
    and at scale re-SCAN — that aggregate per branch (Spark lineages don't
    share subplans), turning one cheap scalar into N full telemetry passes.
    """
    o = load_table(spark, sf_dir, "orders")
    n_users = _n_users(spark, sf_dir)
    start_s = (
        F.lit(_BASE_S)
        + (F.unix_timestamp("o_orderdate") + F.col("o_orderkey") * _STRIDE) % _SPAN_S
    )
    dur_s = (F.col("o_orderkey") % 96 + 1) * 1800
    return o.select(
        F.col("o_orderkey").alias("job_id"),
        (F.col("o_custkey") % F.lit(n_users)).alias("user_id"),
        (F.col("o_orderkey") % 8 + 1).alias("gpus"),
        F.timestamp_seconds(start_s).alias("start_ts"),
        F.timestamp_seconds(start_s + dur_s).alias("end_ts"),
        ((F.col("o_orderstatus") == "P") | (F.col("o_orderkey") % 10 == 0)).alias(
            "failed"
        ),
    )


def _job_days(jobs: DataFrame) -> DataFrame:
    """Explode each job interval into the days it overlaps, with the exact
    per-day overlap seconds (half-open [start_ts, end_ts)). The day span is
    guarded at 100 years: a corrupt sentinel end_ts (9999-12-31) would
    otherwise explode ONE job into 2.9M day rows (functions.guarded_seq_end)."""
    from ..functions import guarded_seq_end

    start_day = F.date_trunc("day", "start_ts")
    end_day = F.date_trunc("day", F.col("end_ts") - F.expr("INTERVAL 1 MICROSECOND"))
    days = jobs.withColumn(
        "dt",
        F.explode(
            F.sequence(
                start_day,
                guarded_seq_end(
                    end_day,
                    F.datediff(end_day, start_day),
                    36_500,
                    "gold job-day explode",
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    overlap = F.least(
        F.unix_timestamp("end_ts"),
        F.unix_timestamp(F.col("dt") + F.expr("INTERVAL 1 DAY")),
    ) - F.greatest(F.unix_timestamp("start_ts"), F.unix_timestamp("dt"))
    return days.withColumn("overlap_s", overlap)


@query(
    "gold_job_efficiency_daily",
    oracle=f"""
    WITH {JOBS_SQL},
    samples AS (
        SELECT j.job_id,
               CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS dt,
               COUNT(*) AS n,
               COUNT(e.value) AS nv,
               SUM(CAST(FLOOR(least(e.value, 100.0) * 1000000 + 0.5) AS BIGINT)) AS su
        FROM jobs j
        JOIN events e
          ON e.user_id = j.user_id
         AND e.ts >= j.start_ts AND e.ts < j.end_ts
        WHERE e.value IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT d.dt, d.job_id, d.user_id, d.gpus,
           d.overlap_s * d.gpus / 3600.0 AS alloc_gpu_hours,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_samples,
           (s.su / 1000000.0) / s.nv AS avg_util_pct,
           d.overlap_s * d.gpus / 3600.0
               * COALESCE((s.su / 1000000.0) / s.nv, 0) / 100.0
               AS used_gpu_hours
    FROM job_days d
    LEFT JOIN samples s ON s.job_id = d.job_id AND s.dt = d.dt
    """,
)
def gold_job_efficiency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference README.md:546-549: GPU-hours allocated vs actively used +
    per-job efficiency, daily. Allocated = interval∩day × gpus; used =
    allocated × mean clamped utilization of the job's samples that day."""
    jobs = sim_jobs(spark, sf_dir)
    # NULL utilization readings are not measurements: exclude them BEFORE
    # the join so the sample count and the mean share one denominator on
    # both engines (least(NULL, 100) would otherwise smuggle NULL samples
    # into the sum as 100% — both Spark's and DuckDB's least skip nulls).
    # spread_input AFTER the pushed-down null filter: the local fixture is a
    # one-row-group parquet file, so the scan -> broadcast-join -> partial-agg
    # stage otherwise runs as ONE task (r9 event-log profile: stage 370,
    # 0.92s single-task = the whole join+agg serial). At cluster scale the
    # scan has thousands of splits and this is a no-op (catalog.spread_input).
    ev = spread_input(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .filter(F.col("value").isNotNull())
    )
    skeleton = _job_days(jobs)
    # Join strategy is SIZE-GATED (the r9 sf100 run found the hard-pinned
    # broadcast dying at the third decade: 150M jobs blew past
    # spark.driver.maxResultSize — the "dim" here is a projection of orders
    # and GROWS with the fact side, so an unconditional broadcast is
    # exactly the plan that fails a 100x scale-up):
    #  * jobs small (usual dim shape): broadcast it explicitly — telemetry
    #    is the 100 TB side, and at local fixture sizes AQE would otherwise
    #    broadcast whichever input happens to be smaller (events), the
    #    exact inversion of the scale plan.
    #  * jobs large: day-bucketed equi-join — reuse the job-day explode
    #    (bounded: a job spans ceil(duration/day)+1 <= 3 buckets at the
    #    48h max duration, and guarded_seq_end caps corrupt spans), then
    #    join events on (user_id, day(ts)) with the interval predicate as
    #    a post-join filter. Shuffles on a users x days composite key —
    #    no driver materialization, AQE handles residual skew. The sample
    #    aggregation is an integer sum over scaled longs, so the result is
    #    bit-identical to the broadcast plan under any partitioning.
    agg_cols = [
        F.count(F.lit(1)).alias("n_samples"),
        # NO final round: both engines run the identical IEEE op sequence
        # on the scaled-long sum, so the raw double is bit-exact, while
        # ROUND(x, 6) tie-breaks differently on half-ulp decimals.
        exact_avg(F.least(ev["value"], F.lit(100.0))).alias("avg_util_pct"),
    ]
    if jobs.count() <= _BROADCAST_JOBS_MAX:
        samples = (
            ev.join(
                F.broadcast(jobs),
                (ev["user_id"] == jobs["user_id"])
                & (ev["ts"] >= jobs["start_ts"])
                & (ev["ts"] < jobs["end_ts"]),
            )
            .groupBy("job_id", F.date_trunc("day", ev["ts"]).alias("dt"))
            .agg(*agg_cols)
        )
    else:
        jd = skeleton.select("job_id", "user_id", "start_ts", "end_ts", "dt")
        samples = (
            ev.join(
                jd,
                (ev["user_id"] == jd["user_id"])
                & (F.date_trunc("day", ev["ts"]) == jd["dt"])
                & (ev["ts"] >= jd["start_ts"])
                & (ev["ts"] < jd["end_ts"]),
            )
            .groupBy("job_id", "dt")
            .agg(*agg_cols)
        )
    alloc = (F.col("overlap_s") * F.col("gpus") / 3600.0).alias("alloc_gpu_hours")
    return (
        skeleton.join(samples, ["job_id", "dt"], "left")
        .select(
            "dt",
            "job_id",
            "user_id",
            "gpus",
            alloc,
            F.coalesce("n_samples", F.lit(0)).alias("n_samples"),
            "avg_util_pct",
            (
                F.col("overlap_s")
                * F.col("gpus")
                / 3600.0
                * F.coalesce(F.col("avg_util_pct"), F.lit(0.0))
                / 100.0
            ).alias("used_gpu_hours"),
        )
    )


@query(
    "gold_user_gpu_usage_daily",
    oracle=f"""
    WITH {JOBS_SQL}
    SELECT user_id, dt,
           CAST(COUNT(*) AS BIGINT) AS n_jobs_active,
           CAST(SUM(overlap_s * gpus) AS BIGINT) / 3600.0 AS gpu_hours,
           CAST(SUM(CASE WHEN date_trunc('day', start_ts) = dt
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_jobs_started,
           CAST(SUM(CASE WHEN date_trunc('day', start_ts) = dt AND failed
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_jobs_failed,
           SUM(CASE WHEN date_trunc('day', start_ts) = dt AND failed
                    THEN 1 ELSE 0 END)
               / NULLIF(SUM(CASE WHEN date_trunc('day', start_ts) = dt
                                 THEN 1 ELSE 0 END), 0) AS failure_rate
    FROM job_days
    GROUP BY user_id, dt
    """,
)
def gold_user_gpu_usage_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference README.md:550-553: per-user GPU-hours, job counts, failure
    rates, daily. One narrow day-explode + one hash aggregation on
    (user_id, dt) — a single shuffle at any scale."""
    days = _job_days(sim_jobs(spark, sf_dir))
    started = F.date_trunc("day", "start_ts") == F.col("dt")
    n_started = F.sum(F.when(started, 1).otherwise(0))
    n_failed = F.sum(F.when(started & F.col("failed"), 1).otherwise(0))
    return days.groupBy("user_id", "dt").agg(
        F.count(F.lit(1)).alias("n_jobs_active"),
        (F.sum(F.col("overlap_s") * F.col("gpus")) / 3600.0).alias("gpu_hours"),
        n_started.alias("n_jobs_started"),
        n_failed.alias("n_jobs_failed"),
        (n_failed / F.nullif(n_started, F.lit(0))).alias("failure_rate"),
    )


# --- BI layer: job runtime distributions (reference README.md:568-573) ------
# "Dashboards like: ... job queue and runtime distributions." The queue/
# runtime profile per outcome — count, quartiles, p95, mean, longest — is
# the drill-down table behind that dashboard panel. Durations are integer
# seconds by construction, so exact interpolated percentiles agree between
# engines bit-for-bit.


@query(
    "job_runtime_distribution",
    oracle=f"""
    WITH jobs AS (
        SELECT (o_orderstatus = 'P' OR o_orderkey % 10 = 0) AS failed,
               (o_orderkey % 96 + 1) * 1800 AS run_time_s
        FROM orders
    )
    SELECT failed,
           CAST(COUNT(*) AS BIGINT) AS n_jobs,
           quantile_cont(run_time_s, 0.25) AS p25_s,
           quantile_cont(run_time_s, 0.50) AS median_s,
           quantile_cont(run_time_s, 0.95) AS p95_s,
           CAST(SUM(run_time_s) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS mean_s,
           CAST(MAX(run_time_s) AS BIGINT) AS max_s
    FROM jobs
    GROUP BY failed
    """,
)
def job_runtime_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference README.md:572 ("job queue and runtime distributions"): the
    runtime profile per job outcome over the simulated jobs dimension. One
    hash aggregation; exact percentiles are ObjectHashAggregate — at fleet
    scale swap to approx_percentile (documented weaker check) or pre-bucket."""
    jobs = sim_jobs(spark, sf_dir)
    d = F.unix_timestamp("end_ts") - F.unix_timestamp("start_ts")
    return (
        jobs.select("failed", d.alias("run_time_s"))
        .groupBy("failed")
        .agg(
            F.count(F.lit(1)).alias("n_jobs"),
            F.percentile("run_time_s", F.lit(0.25)).alias("p25_s"),
            F.percentile("run_time_s", F.lit(0.50)).alias("median_s"),
            F.percentile("run_time_s", F.lit(0.95)).alias("p95_s"),
            (F.sum("run_time_s") / F.count(F.lit(1)).cast("double")).alias("mean_s"),
            F.max("run_time_s").cast("long").alias("max_s"),
        )
    )


# --- Richer GPU-level metrics (reference README.md:556-566 future work) ----
#
# "Simulate additional fields such as: GPU memory usage, power draw,
#  temperature, error counts (ECC, throttling). Build gold tables for:
#  hot / throttled GPUs, error spikes per day."
#
# Simulated sample stream: each event row becomes one GPU sample whose
# device id / temperature / power / ECC counter are pure integer functions
# of event_id — reproduced verbatim in the oracle so the check stays exact.
# temp ∈ [40, 94]; thermal throttle at ≥85; "hot" device-day at max ≥90;
# ECC errors on a sparse 1/97 subset of samples.

_GPU_COLS_SQL = """
        SELECT event_id % 64 AS gpu_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               40 + (event_id * 131) % 55 AS temp_c,
               150 + (event_id * 17) % 250 AS power_w,
               CASE WHEN event_id % 97 = 0 THEN event_id % 5 + 1 ELSE 0 END
                   AS ecc_errors
        FROM events
"""


def _sim_gpu_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    return ev.select(
        (F.col("event_id") % 64).alias("gpu_id"),
        F.date_trunc("day", "ts").alias("dt"),
        (F.lit(40) + (F.col("event_id") * 131) % 55).alias("temp_c"),
        (F.lit(150) + (F.col("event_id") * 17) % 250).alias("power_w"),
        F.when(F.col("event_id") % 97 == 0, F.col("event_id") % 5 + 1)
        .otherwise(F.lit(0))
        .alias("ecc_errors"),
    )


@query(
    "gold_hot_throttled_gpus",
    oracle=f"""
    WITH samples AS ({_GPU_COLS_SQL})
    SELECT gpu_id, dt,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(temp_c) AS BIGINT) AS max_temp_c,
           CAST(SUM(temp_c) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avg_temp_c,
           CAST(MAX(power_w) AS BIGINT) AS max_power_w,
           CAST(SUM(CASE WHEN temp_c >= 85 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_throttled,
           SUM(CASE WHEN temp_c >= 85 THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE) AS throttle_share,
           CAST(SUM(ecc_errors) AS BIGINT) AS ecc_errors,
           CAST(MAX(temp_c) >= 90 AS INT) AS is_hot
    FROM samples
    GROUP BY gpu_id, dt
    HAVING MAX(temp_c) >= 90 OR SUM(CASE WHEN temp_c >= 85 THEN 1 ELSE 0 END) > 0
    """,
)
def gold_hot_throttled_gpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference README.md:556-564: per-device-day thermal health — hot
    (max temp ≥90) or throttled (any sample ≥85) GPUs with sample counts,
    temperature/power profile, throttle share and ECC totals. One scan, one
    hash aggregation on (gpu_id, dt); HAVING prunes healthy devices before
    anything leaves the aggregation — at 100 TB the output is the handful of
    unhealthy device-days, not the fleet."""
    s = _sim_gpu_samples(spark, sf_dir)
    throttled = F.sum(F.when(F.col("temp_c") >= 85, 1).otherwise(0))
    return (
        s.groupBy("gpu_id", "dt")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.max("temp_c").cast("long").alias("max_temp_c"),
            (F.sum("temp_c") / F.count(F.lit(1)).cast("double")).alias("avg_temp_c"),
            F.max("power_w").cast("long").alias("max_power_w"),
            throttled.alias("n_throttled"),
            (throttled / F.count(F.lit(1)).cast("double")).alias("throttle_share"),
            F.sum("ecc_errors").alias("ecc_errors"),
            (F.max("temp_c") >= 90).cast("int").alias("is_hot"),
        )
        .filter((F.col("max_temp_c") >= 90) | (F.col("n_throttled") > 0))
    )


@query(
    "gold_error_spikes_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               CAST(COUNT(*) AS BIGINT) AS n_errors
        FROM events WHERE event_type = 'error'
        GROUP BY 1
    )
    SELECT dt, n_errors,
           CAST(SUM(n_errors) OVER w AS BIGINT)
               / CAST(COUNT(*) OVER w AS DOUBLE) AS trailing_avg,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_days,
           CAST(COUNT(*) OVER w >= 3
                AND n_errors * CAST(COUNT(*) OVER w AS DOUBLE)
                    > 1.5 * SUM(n_errors) OVER w AS INT) AS is_spike
    FROM daily
    WINDOW w AS (ORDER BY dt ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    """,
)
def gold_error_spikes_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference README.md:565-566 ("error spikes per day"): daily error
    volume flagged as a spike when it exceeds 1.5x the trailing-week mean
    (≥3 prior days required so the first days never self-flag). The spike
    predicate is cross-multiplied (n*cnt > 1.5*sum) so both engines compare
    the same integer-derived doubles. Daily rollup is bounded cardinality;
    the ordered window runs on one row per day — scale-safe."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("dt"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    w = Window.orderBy("dt").rowsBetween(-7, -1)
    trailing_sum = F.sum("n_errors").over(w)
    trailing_cnt = F.count(F.lit(1)).over(w)
    return daily.select(
        "dt",
        "n_errors",
        (trailing_sum / trailing_cnt.cast("double")).alias("trailing_avg"),
        trailing_cnt.alias("n_trailing_days"),
        (
            (trailing_cnt >= 3)
            & (F.col("n_errors") * trailing_cnt.cast("double") > 1.5 * trailing_sum)
        )
        .cast("int")
        .alias("is_spike"),
    )

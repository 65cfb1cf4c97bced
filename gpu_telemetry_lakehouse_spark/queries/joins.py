"""Join operators (SURVEY.md §2.2 extension surface).

The reference stages dimension tables "for future joins"
(reference: README.md:60, 82-83, 209) and names a job×metrics interval
rollup as future work (reference: README.md:544-551). Each shape here is the
Spark-first realization: broadcast for small dims, shuffle-hash/sort-merge for
fact-fact, equi-prejoin + range filter for intervals (so the 100 TB plan is a
co-partitioned join, never a cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum
from .registry import dsum, query


# --- equi joins with broadcast dims ------------------------------------------
# customer ⋈ nation ⋈ region: dims are tiny -> explicit F.broadcast keeps the
# big side shuffle-free (at 100 TB the customer scan streams through two
# BroadcastHashJoins with no exchange).
@query(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           {dsum("c.c_acctbal", "sum_acctbal", scale=2)}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal", scale=2).alias("sum_acctbal"),
        )
    )


# --- semi join (EXISTS) ------------------------------------------------------
@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- anti join (NOT EXISTS) --------------------------------------------------
@query(
    "join_anti",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_idle_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_idle_customers"))
    )


# --- left outer join + histogram --------------------------------------------
@query(
    "join_outer_histogram",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def join_outer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# --- TPC-H Q3 shape: fact-fact join + topk (bench headline) ------------------
@query(
    "tpch_q3_shipping",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5 shape: 6-way join, tests Catalyst join ordering (bench) --------
@query(
    "tpch_q5_local_volume",
    oracle=f"""
    SELECT n.n_name,
           {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- interval join: equi-prejoin + range filter ------------------------------
# The jobs[start,end] × metrics.ts shape (reference: README.md:544-548).
# Spark-first scale plan: the equi key (orderkey) co-partitions both sides so
# the range predicate is evaluated inside a hash join, never a cross product.
@query(
    "interval_join_shipments",
    oracle=f"""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_lines,
           {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def interval_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# --- no-equi-key range join via time-bucket prejoin --------------------------
# The 12 busiest hours become ±burst windows [h-30min, h+2h-30min); every
# event falling in a window joins to it with NO shared key — the shape a
# naive plan turns into BroadcastNestedLoopJoin. bucketed_range_join rewrites
# it as an hour-bucket equi-join (tests/test_plans.py asserts no BNLJ/
# CartesianProduct in the physical plan).
@query(
    "range_join_busy_windows",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events GROUP BY 1
    ),
    top12 AS (SELECT h FROM hourly ORDER BY c DESC, h LIMIT 12),
    wins AS (
        SELECT CAST(h - INTERVAL 30 MINUTE AS TIMESTAMP) AS ws,
               CAST(h + INTERVAL 90 MINUTE AS TIMESTAMP) AS we
        FROM top12
    )
    SELECT w.ws, w.we, COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM wins w JOIN events e ON e.ts >= w.ws AND e.ts < w.we
    GROUP BY 1, 2
    """,
)
def range_join_busy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import scale as SC

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wins = (
        hourly.orderBy(F.col("c").desc(), "h")
        .limit(12)
        .select(
            (F.col("h") - F.expr("INTERVAL 30 MINUTES")).alias("ws"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("we"),
        )
    )
    return (
        SC.bucketed_range_join(ev, wins, "ts", "ws", "we", bucket_seconds=3600)
        .groupBy("ws", "we")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --- as-of join: latest prior 'error' event per user -------------------------
# As-of re-expressed as a running conditional max over an event-time window —
# one shuffle on the partition key, no join at all (SURVEY.md §2.2 "as-of via
# window over union"; here both streams share one table).
@query(
    "asof_last_error",
    oracle="""
    SELECT event_id, ts,
           MAX(CASE WHEN event_type = 'error' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS last_error_ts
    FROM events
    """,
)
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return ev.select(
        "event_id",
        "ts",
        F.max(F.when(F.col("event_type") == "error", F.col("ts"))).over(w).alias("last_error_ts"),
    )


# --- theta (inequality) join, re-planned as bucketed rank counting -----------
# "For each supplier, how many customers hold a strictly larger account
# balance?" The textbook plan is a nested-loop inequality join (O(n*m) —
# BroadcastNestedLoopJoin in Spark, unusable at 100 TB). Two-phase scale
# re-expression with NO join on the big sides and NO global sort:
#   1. bucket both sides by a fixed-width value range; a per-bucket customer
#      histogram (≤ a few thousand rows regardless of data size) is
#      prefix-summed and broadcast — customers in strictly-higher buckets.
#   2. within each bucket, a union + ranking window (partitioned by bucket,
#      so fully parallel) counts same-bucket customers with a larger balance.
# Tie rule: equal balances must not count, so suppliers order before
# customers at the same balance (is_customer ASC secondary key); cross-bucket
# ties are impossible (equal values share a bucket).
@query(
    "theta_join_balance_rank",
    oracle="""
    SELECT s.s_suppkey,
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_acctbal > s.s_acctbal) AS n_richer_customers
    FROM supplier s
    """,
)
def theta_join_balance_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    bucket = lambda c: F.floor(F.col(c) / 1000.0)  # noqa: E731 — fixed width
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("bal"),
        bucket("s_acctbal").alias("bkt"),
        F.lit(0).alias("is_customer"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("bal"),
        bucket("c_acctbal").alias("bkt"),
        F.lit(1).alias("is_customer"),
    )
    # Phase 1: customers in strictly-higher buckets (tiny cumulative histogram,
    # computed with a window over ≤ O(#buckets) rows, broadcast-joined back).
    hist = cust.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_in_bkt"))
    w_hist = W.orderBy(F.col("bkt").desc()).rowsBetween(W.unboundedPreceding, -1)
    above = hist.select(
        "bkt", F.coalesce(F.sum("n_in_bkt").over(w_hist), F.lit(0)).alias("n_above_bkt")
    )
    # Phase 2: same-bucket strict count via ranking window, parallel per bucket.
    both = sup.unionByName(cust)
    w_in = (
        W.partitionBy("bkt")
        .orderBy(F.col("bal").desc(), F.col("is_customer").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = both.withColumn(
        "n_in_bucket_above", F.coalesce(F.sum("is_customer").over(w_in), F.lit(0))
    )
    return (
        ranked.filter(F.col("is_customer") == 0)
        .join(F.broadcast(above), "bkt", "left")
        .select(
            F.col("key").alias("s_suppkey"),
            (F.col("n_in_bucket_above") + F.coalesce(F.col("n_above_bkt"), F.lit(0))).alias(
                "n_richer_customers"
            ),
        )
    )


# --- as-of enrichment across two tables --------------------------------------
# Each event picks up the user's latest order date at or before the event —
# the two-table as-of join. PLANNED AS THE UNION+WINDOW REWRITE: tag both
# sides, union on (user, ts), one co-partitioning shuffle, and a running
# max of the order-side timestamp delivers every event's answer in a single
# codegen window pass. This replaces the round-3 cogrouped-pandas plan
# (operators/cogroup.py::asof_enrich — kept as the per-key escape hatch for
# logic that outgrows SQL, equivalence pinned in tests/test_properties.py):
# cogroup.applyInPandas pays one Python/Arrow round-trip PER KEY, which at
# sf0.1's ~15k users measured 18s vs ~0.6s for this plan — and at 100 TB
# the per-key interpreter tax scales with keys, while the window pass stays
# whole-stage-codegen.
@query(
    "asof_enrich_orders",
    oracle="""
    SELECT e.event_id, e.ts, e.user_id,
           (SELECT MAX(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
               AS last_order_ts
    FROM events e
    """,
)
def asof_enrich_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    # kind 0 = order, 1 = event: at equal timestamps the order sorts FIRST,
    # so an order ON the event's timestamp is visible (<= semantics)
    left = ev.select(
        "user_id",
        F.col("ts").alias("__t"),
        F.lit(1).alias("__kind"),
        "event_id",
        "ts",
        F.lit(None).cast("timestamp").alias("__ot"),
    )
    right = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("__t"),
        F.lit(0).alias("__kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("o_orderdate").cast("timestamp").alias("__ot"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("__t", "__kind")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        left.unionByName(right)
        .withColumn("last_order_ts", F.max("__ot").over(w))
        .filter(F.col("__kind") == 1)
        .select("event_id", "ts", "user_id", "last_order_ts")
    )


# --- SQL join hints -----------------------------------------------------------
# The /*+ BROADCAST */ hint surface: analysts pin strategies in SQL the way
# the DataFrame API uses F.broadcast. Differential on results; the plan gate
# in tests/test_plans.py pins that the hint was honored (BroadcastHashJoin
# even though autoBroadcast sizing alone might choose otherwise).
@query(
    "hinted_join_revenue",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_totalprice > 100000
    GROUP BY n.n_name
    """,
)
def hinted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(
        """
        SELECT /*+ BROADCAST(c), BROADCAST(n) */
               n.n_name, COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_totalprice > 100000
        GROUP BY n.n_name
        """
    )

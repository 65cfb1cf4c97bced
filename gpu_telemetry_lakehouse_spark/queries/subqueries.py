"""Subquery-shaped relational surface: EXISTS/NOT-EXISTS semi-joins, scalar
subqueries, and correlated aggregates in their decorrelated Spark form.

The reference delegates all SQL to DuckDB (SURVEY.md §2.1 S3/S4); these
queries extend §2.2's join/subquery rows with the classic TPC-H subquery
shapes (q2/q4/q13/q14/q15/q17/q18/q19/q22 analogues adapted to the driver's
synthetic star schema). Each decorrelates the textbook correlated form into
aggregate-then-join — the plan Catalyst itself produces for correlated
scalar subqueries, written explicitly so the physical plan is inspectable:
small aggregate sides are broadcast, fact-side filters stay pushed into the
parquet scan.

Scale notes (100 TB tier):
- every aggregate-side here is orders-of-magnitude smaller than the fact
  table (per-part averages, per-type averages, per-supplier totals), so the
  decorrelated join is a broadcast, never a shuffle of lineitem;
- `l_quantity` is integer-valued, so plain AVG is bit-exact cross-engine
  (integer-valued double sums are order-independent below 2^53); monetary
  sums use the scaled-long exact_sum/dsum tactic (registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..functions import exact_avg, exact_sum
from .registry import davg, dsum, query


# --- q4 shape: EXISTS semi-join, grouped count -------------------------------
@query(
    "exists_priority_counts",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def exists_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li.filter(F.col("l_quantity") >= 48),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- q13 shape: outer join -> per-key count -> count distribution ------------
@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- q14 shape: conditional aggregation ratio (promo revenue share) ----------
@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT
        {dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "promo_revenue")},
        {dsum("l.l_extendedprice * (1 - l.l_discount)", "total_revenue")},
        (100.0 * (SUM(CAST(FLOOR((CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) * 10000 + 0.5) AS BIGINT)) / 10000.0)
               / (SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000.0)) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agged = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            exact_sum(promo).alias("promo_revenue"),
            exact_sum(rev).alias("total_revenue"),
        )
    )
    return agged.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_share_pct"
        ),
    )


# --- q15 shape: scalar MAX subquery over a derived aggregate -----------------
@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM lineitem
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    # total_revenue derives from identical scaled-long sums on both engines, so
    # the double-equality against its max is deterministic.
    best = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- q17 shape: correlated per-group average, decorrelated -------------------
@query(
    "small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum("l.l_extendedprice", "small_qty_revenue", scale=2)},
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.3 * pa.avg_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # plain AVG is exact here: quantities are integer-valued (sum order-free)
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.3 * F.col("avg_qty"))
        .agg(
            exact_sum(F.col("l_extendedprice"), scale=2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- q18 shape: HAVING on a grouped sum, joined back to dims -----------------
@query(
    "large_volume_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, t.sum_qty
    FROM (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))  # integer-valued: exact
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --- q19 shape: disjunctive multi-attribute predicates across a join ---------
@query(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand IN ('Brand#11','Brand#12','Brand#13')
           AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand IN ('Brand#21','Brand#22','Brand#23')
           AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand IN ('Brand#31','Brand#32','Brand#33')
           AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")

    def arm(brands: list[str], qlo: int, qhi: int, smax: int):
        return (
            F.col("p_brand").isin(brands)
            & q.between(qlo, qhi)
            & F.col("p_size").between(1, smax)
        )

    cond = (
        arm(["Brand#11", "Brand#12", "Brand#13"], 1, 11, 5)
        | arm(["Brand#21", "Brand#22", "Brand#23"], 10, 20, 10)
        | arm(["Brand#31", "Brand#32", "Brand#33"], 20, 30, 15)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- q22 shape: scalar AVG subquery + NOT EXISTS anti-join -------------------
# (classic "customers with no orders" is empty on the synthetic data — every
# customer has orders — so the anti side is "no URGENT orders", which keeps
# the NOT EXISTS branch non-trivial at every SF.)
@query(
    "idle_balance_customers",
    oracle=f"""
    SELECT c.c_nationkey, COUNT(*) AS n_cust,
           {dsum("c.c_acctbal", "total_bal", scale=2)}
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {davg("c_acctbal", "a", scale=2).replace(" AS a", "")}
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def idle_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(exact_avg(F.col("c_acctbal"), scale=2).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            exact_sum(F.col("c_acctbal"), scale=2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# --- q2 shape: per-group scalar threshold (parts above their type average) ---
@query(
    "above_type_avg_parts",
    oracle=f"""
    WITH ta AS (
        SELECT p_type, {davg("p_retailprice", "avg_price", scale=2)}
        FROM part GROUP BY p_type
    )
    SELECT p.p_partkey, p.p_name, p.p_type, p.p_retailprice, ta.avg_price
    FROM part p
    JOIN ta ON ta.p_type = p.p_type
    WHERE p.p_retailprice > ta.avg_price
    ORDER BY p.p_retailprice DESC, p.p_partkey
    LIMIT 25
    """,
)
def above_type_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    ta = p.groupBy(F.col("p_type").alias("ta_type")).agg(
        exact_avg(F.col("p_retailprice"), scale=2).alias("avg_price")
    )
    return (
        p.join(F.broadcast(ta), F.col("p_type") == F.col("ta_type"))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select("p_partkey", "p_name", "p_type", "p_retailprice", "avg_price")
        .orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .limit(25)
    )


# --- q21-lite: semi + anti combination over time-sliced activity -------------
@query(
    "supplier_churn_9798",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey
          AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    )
    ORDER BY s.s_suppkey
    """,
)
def supplier_churn_9798(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")

    def year(y: int) -> DataFrame:
        return li.filter(
            (F.col("l_shipdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("l_suppkey")

    return (
        s.join(year(1997), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(year(1998), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- array/lambda functions over the embedding column ------------------------
# Higher-order-function coverage (SURVEY.md §2.2 JSON/map/array row): a
# scaled-long fold keeps the per-element squares exact cross-engine, so the
# squared-norm is a deterministic BIGINT (same tactic as exact_sum).
@query(
    "array_norms_vectors",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(list_sum(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           )) AS BIGINT) AS sq_norm_scaled
    FROM embeddings
    ORDER BY sq_norm_scaled DESC, vec_id
    LIMIT 100
    """,
)
def array_norms_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.floor(xd(x) * xd(x) * 1000000 + F.lit(0.5)).cast("long"),
    )
    return (
        emb.select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            sq.alias("sq_norm_scaled"),
        )
        .orderBy(F.col("sq_norm_scaled").desc(), "vec_id")
        .limit(100)
    )


# --- recursive CTE (Spark 4): month spine + zero-filled rollup ---------------
# Generates the complete month spine between the first and last order date
# by recursion — months with no orders appear with n=0 (the gap every naive
# GROUP BY silently drops). Both engines run the SAME recursive SQL shape;
# recursion depth = #months (~80), well under the engine iteration cap.
# Scale note: a recursive spine is driver-cheap (rows = months); the orders
# aggregation is the only data-sized stage and joins the spine broadcast.
@query(
    "recursive_month_spine",
    oracle="""
    WITH RECURSIVE spine(mo) AS (
        SELECT date_trunc('month', MIN(o_orderdate)) FROM orders
        UNION ALL
        SELECT mo + INTERVAL 1 MONTH FROM spine
        WHERE mo < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
    ),
    per_month AS (
        SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT s.mo, COALESCE(p.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN per_month p ON p.mo = s.mo
    """,
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hoist the recursion bounds into literals from ONE tiny min/max agg
    # (bounded 1-row collect): leaving the MAX as a correlated scalar
    # subquery inside the recursive step makes Spark re-evaluate it — a
    # full orders scan — PER ITERATION (measured 14s for a ~25-month spine
    # at sf0.1; 0.4s with literal bounds). The recursion itself stays real:
    # month rows are generated iteratively, depth = #months.
    register_views(spark, sf_dir, ["orders"])
    lo, hi = spark.sql(
        "SELECT date_trunc('month', MIN(o_orderdate)),"
        "       date_trunc('month', MAX(o_orderdate)) FROM orders"
    ).first()
    if lo is None or hi is None:
        # Empty orders: MIN/MAX are NULL and "TIMESTAMP '{lo}'" would render
        # as the unparsable TIMESTAMP 'None'. The recursive oracle degrades
        # to an empty spine in that case — match it with a typed empty frame.
        return spark.sql(
            "SELECT CAST(NULL AS TIMESTAMP) AS mo, CAST(NULL AS BIGINT) AS n_orders WHERE FALSE"
        )
    return spark.sql(
        f"""
        WITH RECURSIVE spine(mo) AS (
            SELECT TIMESTAMP '{lo}'
            UNION ALL
            SELECT mo + INTERVAL 1 MONTH FROM spine
            WHERE mo < TIMESTAMP '{hi}'
        ),
        per_month AS (
            SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT s.mo, COALESCE(p.n_orders, 0) AS n_orders
        FROM spine s LEFT JOIN per_month p ON p.mo = s.mo
        """
    )


# --- correlated LATERAL derived table ----------------------------------------
# Top-2 orders per customer via JOIN LATERAL (the per-row subquery form;
# Catalyst decorrelates it into a ranked window under the hood — same plan
# class as window_topk_per_group, expressed in the SQL shape analysts write).
@query(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o ON true
    WHERE c.c_custkey < 100
    """,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_custkey < 100
        """
    )


# --- SQL scripting (Spark 4): iterative parameter search ---------------------
# Control-flow SQL (BEGIN/DECLARE/WHILE): find the coarsest power-of-two
# histogram bucket width whose busiest bucket holds <= 10% of orders —
# the adaptive-binning loop a procedure writer expresses imperatively.
# The oracle is the declarative equivalent (evaluate all candidate widths,
# take the max satisfying one): monotonicity of "busiest share" in the
# width makes the halving loop and the declarative max agree exactly.
@query(
    "sql_scripting_adaptive_bins",
    oracle="""
    WITH cand AS (
        SELECT CAST(power(2, g) AS BIGINT) AS w FROM generate_series(0, 20) t(g)
    ),
    busiest AS (
        SELECT w,
               (SELECT MAX(cnt) FROM (
                   SELECT COUNT(*) AS cnt FROM orders
                   GROUP BY CAST(FLOOR(o_totalprice / w) AS BIGINT)) q) AS b
        FROM cand
    ),
    lim AS (SELECT COUNT(*) / 10.0 AS l FROM orders)
    SELECT COALESCE(MAX(w), 1) AS bucket_width
    FROM busiest, lim WHERE b <= l
    """,
)
def sql_scripting_adaptive_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE w BIGINT DEFAULT 1048576;
          DECLARE busiest BIGINT;
          DECLARE lim DOUBLE;
          SET lim = (SELECT COUNT(*) / 10.0 FROM orders);
          SET busiest = (SELECT MAX(cnt) FROM (
              SELECT COUNT(*) AS cnt FROM orders
              GROUP BY CAST(FLOOR(o_totalprice / w) AS BIGINT)) q);
          WHILE busiest > lim AND w > 1 DO
            SET w = w DIV 2;
            SET busiest = (SELECT MAX(cnt) FROM (
                SELECT COUNT(*) AS cnt FROM orders
                GROUP BY CAST(FLOOR(o_totalprice / w) AS BIGINT)) q);
          END WHILE;
          SELECT w AS bucket_width;
        END
        """
    )


# --- GROUP BY ALL / ORDER BY ALL (Spark 4 SQL sugar) -------------------------
# The analyst-ergonomics form: grouping keys inferred from the non-aggregate
# select list, ordering over the whole output. The IDENTICAL SQL string runs
# on both engines (the exact-sum staging is portable arithmetic), so the
# check covers the sugar's semantics, not a hand-translated equivalent.
_GBA_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           (SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / CAST(100 AS DOUBLE)) AS sum_price
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@query("group_by_all_orders", oracle=_GBA_SQL)
def group_by_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_GBA_SQL)


# --- null-safe equality join (<=> / IS NOT DISTINCT FROM) --------------------
# NULL join keys silently vanish from a plain equi join; the null-safe
# operator keeps them as their own match bucket — still a hash join (the
# null-safe comparison is an equi key to Spark), never a nested loop. The
# NULL bucket here is manufactured with NULLIF so the semantics difference
# is visible in the counts.
@query(
    "null_safe_join_status",
    oracle="""
    WITH l AS (
        SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS k FROM orders
    ),
    d AS (SELECT DISTINCT NULLIF(o_orderstatus, 'O') AS k FROM orders)
    SELECT d.k, COUNT(l.o_orderkey) AS n
    FROM l JOIN d ON l.k IS NOT DISTINCT FROM d.k
    GROUP BY d.k
    """,
)
def null_safe_join_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    left = o.select("o_orderkey", k.alias("k"))
    dim = o.select(k.alias("dk")).distinct()
    return (
        left.join(dim, left["k"].eqNullSafe(dim["dk"]))
        .groupBy(F.col("dk").alias("k"))
        .agg(F.count("o_orderkey").alias("n"))
    )

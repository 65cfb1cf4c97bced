"""Multi-join analytical shapes: TPC-H q7/q8/q9 analogues on the synthetic
star schema (no partsupp table — q9's supply cost becomes a retail-price
proxy).

These are the join-order stress tests: 5-6 way joins where every dimension
side is broadcastable and only the lineitem↔orders edge is a real shuffle.
At 100 TB the right plan is: filter dims first (region/nation predicates),
broadcast them, stream lineitem through one stage of broadcast hash joins,
then a single exchange for the final group-by — which is exactly what
Catalyst produces for these DataFrame plans (see test_plans.py gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum
from .registry import dsum, query

_REV = "l.l_extendedprice * (1 - l.l_discount)"


# --- q7: volume shipping between two nations, by year ------------------------
@query(
    "nation_pair_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum("volume", "revenue")}
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               {_REV} AS volume
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
            OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum("volume").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- q8: a nation's market share within its region, by year ------------------
@query(
    "nation_market_share",
    oracle=f"""
    WITH base AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_REV} AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = nc.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           ((SUM(CAST(ROUND((CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) * 10000) AS BIGINT)) / 10000.0)
            / (SUM(CAST(ROUND(volume * 10000) AS BIGINT)) / 10000.0)) AS mkt_share
    FROM base
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nc = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    ).select(F.col("n_nationkey").alias("nc_key"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0))
    return (
        base.groupBy("o_year")
        .agg(
            exact_sum(nat_vol).alias("_nat"),
            exact_sum(F.col("volume")).alias("_all"),
        )
        .select("o_year", (F.col("_nat") / F.col("_all")).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- q9: product profit by supplier nation and year --------------------------
# (no partsupp at this scale factor: cost proxy = 0.5 * p_retailprice * qty)
@query(
    "product_profit_by_nation",
    oracle=f"""
    SELECT nation, o_year, {dsum("amount", "sum_profit", scale=2)}
    FROM (
        SELECT ns.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_REV} - 0.5 * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%ring%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%ring%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(exact_sum("amount", scale=2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )

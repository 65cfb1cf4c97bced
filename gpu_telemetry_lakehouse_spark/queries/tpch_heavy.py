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
           ((SUM(CAST(FLOOR((CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) * 10000 + 0.5) AS BIGINT)) / 10000.0)
            / (SUM(CAST(FLOOR(volume * 10000 + 0.5) AS BIGINT)) / 10000.0)) AS mkt_share
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


# --- q12 shape: join + conditional two-way counts by a line dimension --------
# (no l_shipmode in the synthetic schema; l_returnflag plays the mode dim,
#  and the ship-year window replaces the receiptdate window.)
@query(
    "priority_line_counts",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- q16 shape: distinct-count per part attrs with NOT-IN supplier exclusion --
# (lineitem stands in for partsupp as the part↔supplier incidence relation;
#  the "customer complaints" exclusion becomes a supplier-name pattern.)
@query(
    "part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- q20 shape: suppliers dominating a part's 1997 shipments ------------------
# (partsupp availqty is absent, so the "more than half of availqty" predicate
#  becomes "more than half of the part's total shipped quantity" — the same
#  correlated-threshold shape, decorrelated into agg-then-join. Quantity sums
#  are integer-valued doubles, hence order-independent and exact.)
@query(
    "dominant_part_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
    ), pt AS (
        SELECT l_partkey, SUM(qty) AS tot FROM sp GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM sp JOIN pt ON pt.l_partkey = sp.l_partkey
        WHERE sp.l_suppkey = s.s_suppkey AND sp.qty > 0.5 * pt.tot
    )
    ORDER BY s.s_suppkey
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    pt = sp.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(F.sum("qty").alias("tot"))
    dominant = (
        sp.join(F.broadcast(pt), F.col("l_partkey") == F.col("pt_partkey"))
        .filter(F.col("qty") > 0.5 * F.col("tot"))
        .select("l_suppkey")
    )
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_suppkey")
    )


# --- q21 shape: double-correlated EXISTS / NOT EXISTS, decorrelated ----------
# ("late supplier" semantics need l_receiptdate, which the synthetic schema
#  lacks; l_returnflag='R' on 'F'-status orders plays the fault condition.
#  The correlated pair — EXISTS another supplier on the order / NOT EXISTS
#  another *faulty* supplier — decorrelates to one per-order distinct-count
#  aggregate, co-partitioned with the fact join on l_orderkey.)
@query(
    "sole_fault_suppliers",
    oracle="""
    WITH ord AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_r
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN ord        ON ord.l_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R' AND ord.n_supp > 1 AND ord.n_supp_r = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def sole_fault_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # Two-level aggregate instead of a double countDistinct: multi-distinct
    # plans an Expand (every lineitem row times the distinct-column count)
    # before the shuffle; pre-grouping by (order, supplier) shuffles each
    # pair once and the second level is a plain count/sum — measured 1.9x
    # faster at sf1 (5.4s -> 2.8s, r8 scale-trend plan audit), bit-identical
    # result. Both levels hash-partition on l_orderkey prefixes, so AQE
    # chains them without a second full shuffle of the fact table.
    # NULL suppkeys are invisible to the oracle's COUNT(DISTINCT ...) but
    # would form a counted group here — filter them for exact agreement on
    # adversarial corpora (they can never join supplier downstream anyway)
    # ONE fact pass, ONE fact exchange (r9: was two scans + three exchanges):
    # the probe side (l_returnflag='R' rows) previously re-scanned and
    # re-shuffled lineitem a second time, and the ord_stats self-join paid a
    # third exchange. Shuffling the projected fact ONCE by l_orderkey lets
    # the (order, supplier) aggregate, the per-order stats (as unbounded
    # windows over the SAME partitioning — no extra exchange, no self-join)
    # and the order-key semi-join all reuse that partitioning. numwait =
    # SUM(n_r) over qualifying pairs is integer-exact vs counting the rows.
    # Measured 1.46s -> 0.86s at sf0.1, bit-identical; plan: 4 -> 2
    # exchanges. repartition("ok") carries no partition count, so AQE sizes
    # it from the data at any scale.
    from pyspark.sql import Window as W

    li2 = (
        li.filter(F.col("l_suppkey").isNotNull())
        .select(
            F.col("l_orderkey").alias("ok"),
            "l_suppkey",
            (F.col("l_returnflag") == "R").cast("int").alias("r"),
        )
        .repartition("ok")
    )
    per_supp = li2.groupBy("ok", "l_suppkey").agg(
        F.max("r").alias("has_r"),
        F.sum("r").alias("n_r"),
    )
    w = W.partitionBy("ok")
    qual = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_supp_r", F.sum("has_r").over(w))
        .filter((F.col("n_r") > 0) & (F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
    )
    return (
        qual.join(o, F.col("ok") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_r").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
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


# --- q2: argmin join-back (cheapest supplier per part) -----------------------
@query(
    "cheapest_supplier_per_part",
    oracle="""
    WITH unit AS (
        SELECT DISTINCT l_partkey, l_suppkey,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem
    ), mn AS (
        SELECT l_partkey, MIN(unit_price) AS min_unit_price
        FROM unit GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, mn.min_unit_price
    FROM unit u
    JOIN mn ON mn.l_partkey = u.l_partkey AND u.unit_price = mn.min_unit_price
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
    JOIN part p ON p.p_partkey = u.l_partkey
    WHERE p.p_size <= 5
    ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_name
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 analogue (no partsupp table -> lineitem unit price is the
    supply cost; reference README.md:82-83 stages gpu_specs 'for future
    joins' but never implements the min-cost pick).

    Decorrelated argmin: the textbook form is a correlated scalar subquery
    ``WHERE unit_price = (SELECT MIN(...) WHERE l2.l_partkey = p_partkey)``;
    Catalyst would rewrite that into exactly this aggregate + join-back. The
    per-part MIN side is |parts|-sized (tiny vs lineitem at 100 TB), so it
    broadcasts; unit_price equality is safe cross-engine because both sides
    compute the identical IEEE-754 division. DISTINCT first so repeated
    (part, supplier, price) lineitems don't duplicate output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_size")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    ).distinct()
    # rename the agg-side key: mn derives from unit, so unit.l_partkey and
    # mn.l_partkey share lineage and Spark would resolve the equality as
    # trivially true (self-join ambiguity)
    mn = (
        unit.groupBy(F.col("l_partkey").alias("mn_partkey"))
        .agg(F.min("unit_price").alias("min_unit_price"))
    )
    return (
        unit.join(
            F.broadcast(mn),
            (F.col("l_partkey") == F.col("mn_partkey"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .drop("mn_partkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(p.filter(F.col("p_size") <= 5)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "min_unit_price")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
    )


# --- q11: global-share HAVING (important parts by inventory value) -----------
@query(
    "important_parts_value_share",
    oracle=f"""
    WITH val AS (
        SELECT l.l_partkey, {dsum(_REV, "part_value")}
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM val
    WHERE part_value > (
        SELECT (SUM(CAST(FLOOR(part_value * 10000 + 0.5) AS BIGINT)) / 10000.0)
        FROM val
    ) * 0.001
    ORDER BY part_value DESC, l_partkey
    """,
)
def important_parts_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 analogue: per-part value restricted to a supplier-nation
    slice, kept only when the part's share exceeds a fraction of the GLOBAL
    total — the ungrouped-scalar-subquery-in-HAVING shape.

    The scalar total is a 1-row aggregate of the already-aggregated per-part
    frame: broadcast-crossJoin it rather than collect() so the whole thing
    stays one lazy plan (no driver round-trip; at 100 TB the per-part frame
    is |parts|-sized and the rollup to 1 row is map-side). Both the per-part
    and the grand total use the scaled-long exact sum so the > comparison
    sees bit-identical doubles on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    val = (
        li.join(
            F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_partkey", rev.alias("rev"))
        .groupBy("l_partkey")
        .agg(exact_sum("rev").alias("part_value"))
    )
    total = val.agg(exact_sum("part_value").alias("grand_total"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("grand_total") * 0.001)
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# --- q17: small-quantity-order revenue (correlated AVG, decorrelated) --------
# The classic correlated scalar subquery (l_quantity < 0.2 * per-part avg)
# decorrelated into a per-part aggregate joined back broadcast: one pass to
# build the (part -> threshold) table, one streaming pass over lineitem.
# The threshold uses the deterministic scaled-long mean so the < comparison
# is engine-identical even for rows landing exactly on the boundary.
@query(
    "small_qty_order_revenue",
    oracle="""
    WITH t AS (
        SELECT l_partkey,
               0.2 * ((SUM(CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                      / COUNT(l_quantity)) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND((SUM(CAST(FLOOR(l.l_extendedprice * 10000 + 0.5) AS BIGINT)) / 10000.0) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < t.qty_thresh
    """,
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import exact_avg

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    t = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * exact_avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_brand") == "Brand#11")
        .join(t, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(exact_sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
        )
    )


# --- q19: disjunctive multi-attribute predicate revenue ----------------------
# Three OR-branches over joined part+lineitem attributes (brand x size x
# quantity bands) — the predicate-pushdown/DNF stress shape. Catalyst pushes
# the common l_quantity bounds below the join and evaluates the residual OR
# post-join; the dim side broadcasts.
@query(
    "brand_band_revenue",
    oracle=f"""
    SELECT {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def brand_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    b = F.col("p_brand")
    s = F.col("p_size")
    pred = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(
            exact_sum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q22: dormant rich customers by country band -----------------------------
# Scalar-subquery average (broadcast 1-row aggregate folded into the plan,
# never an eager driver count) + NOT EXISTS as a left-anti join, grouped by
# an adapted country band (c_nationkey % 5 stands in for the phone prefix).
@query(
    "dormant_customer_balances",
    oracle="""
    WITH avg_bal AS (
        SELECT (SUM(CAST(FLOOR(c_acctbal * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / COUNT(c_acctbal) AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey % 5 AS INT) AS country_band,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           (SUM(CAST(FLOOR(c.c_acctbal * 10000 + 0.5) AS BIGINT)) / 10000.0) AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def dormant_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import exact_avg

    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("country_band"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum("c_acctbal").alias("total_bal"),
        )
    )

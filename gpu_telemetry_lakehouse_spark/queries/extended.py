"""Extended relational surface: classic scan-agg (TPC-H q6/q10 shapes),
pivot, GROUPING SETS, sessionization (gaps-and-islands), token frequency,
and exact-dup group extraction.

These widen SURVEY.md §2.2 coverage: pivot/conditional aggregation, explicit
grouping sets, event sessionization (the streaming session-window's batch
twin), and the "collect the duplicate groups" form of exact dedup that a
training-data pipeline actually executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table, spread_input, register_views
from ..functions import exact_sum, md5_int, tokens
from .registry import dsum, query

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


# --- TPC-H q6 shape: tight scan + filter + single agg ------------------------
# The canonical predicate-pushdown probe: every filter reaches the parquet
# row-group zone maps; the agg is one partial-combined long sum.
@query(
    "tpch_q6_revenue",
    oracle=f"""
    SELECT {dsum("l_extendedprice * l_discount", "revenue", scale=6)},
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- TPC-H q10 shape: 3-way join + group + top-k -----------------------------
@query(
    "tpch_q10_returns",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- pivot / conditional aggregation -----------------------------------------
# Spark's pivot yields NULL for an absent (group, value) cell; the oracle's
# SUM(CASE WHEN ... THEN 1 END) (no ELSE) reproduces exactly that.
@query(
    "pivot_status_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.lit(1)))
    )


# --- explicit GROUPING SETS --------------------------------------------------
@query(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {dsum("o_totalprice", "sum_price", scale=2)}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    m = 10**2
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               (SUM(CAST(FLOOR(o_totalprice * {m} + 0.5) AS BIGINT)) / CAST({m} AS DOUBLE)) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# --- sessionization (gaps-and-islands) ---------------------------------------
# Batch twin of a streaming session window (30-min inactivity gap): mark
# session starts with lag(), number sessions with a running sum, aggregate.
# At scale this is one shuffle on user_id; state never leaves the window
# operator (compare Structured Streaming's session_window for the live path).
@query(
    "session_windows_users",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM marked
    )
    SELECT user_id, session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_windows_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    marked = ev.withColumn(
        "is_start",
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_US) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_no", F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- token frequency (explode -> count -> deterministic top-k) ---------------
@query(
    "token_freq_top",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS cnt
    FROM tok
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
)
def token_freq_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(50)
    )


# --- exact-dup groups (the actionable form of exact dedup) -------------------
# Normalize -> hash -> group; emit only groups with >1 member, with the
# sorted member list (what a pipeline feeds into "keep first, drop rest").
@query(
    "dedup_groups_exact",
    oracle=r"""
    WITH h AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
        FROM documents
    )
    SELECT content_hash, COUNT(*) AS group_size,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM h
    GROUP BY content_hash
    HAVING COUNT(*) > 1
    """,
)
def dedup_groups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # doc_ids is a SCALAR join of the sorted member ids, not an array cell:
    # the driver's canonicalizer cannot hash nested cells, and on clean
    # corpora the >1 filter made the old array column VACUOUSLY green —
    # the r8 duplicate-every-row corpus exposed it the moment real groups
    # appeared (numeric sort first, then stringify, both engines).
    members = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return (
        docs.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            members.alias("doc_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


# --- triangle counting on a derived co-activity graph ------------------------
# Graph analytics beyond connected components: users who co-occur in >= 4
# (hour, event_type) activity buckets form an edge; triangles come from the
# classic ordered-edge enumeration (u < v < w, each triangle found exactly
# once) — two equi joins on node keys, never an all-pairs pass. Per-bucket
# pair generation is bounded by bucket occupancy (the df-cap idea again);
# at web scale the standard skew upgrade is degree-orientation (point each
# edge at the higher-degree endpoint), which caps join fan-out at max
# out-degree ~ sqrt(edges) while still enumerating each triangle once.
# Output = per-user triangle participation counts.
_COACT_W = 4
# bucket-size cap before pairing — b² pairs per bucket with bucket size
# growing linearly in data volume; same rationale and value as
# queries/search.py::_PR_BUCKET_CAP (active at sf0.1, oracle-matched)
_COACT_CAP = 40


@query(
    "triangle_count_cousers",
    oracle=f"""
    WITH b0 AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type AS et
        FROM events
    ),
    b AS (
        SELECT b0.* FROM b0
        JOIN (SELECT h, et FROM b0 GROUP BY h, et
              HAVING COUNT(*) <= {_COACT_CAP}) ok
          ON b0.h = ok.h AND b0.et = ok.et
    ),
    e AS (
        SELECT a.user_id AS u, c.user_id AS v
        FROM b a JOIN b c ON a.h = c.h AND a.et = c.et AND a.user_id < c.user_id
        GROUP BY a.user_id, c.user_id HAVING COUNT(*) >= {_COACT_W}
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS bb, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
        SELECT a AS user_id FROM tri
        UNION ALL SELECT bb FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT user_id, COUNT(*) AS n_triangles FROM nodes GROUP BY user_id
    """,
)
def triangle_count_cousers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("h"),
        F.col("event_type").alias("et"),
    ).distinct()
    ok = (
        b.groupBy("h", "et")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= _COACT_CAP)
        .select("h", "et")
    )
    b = b.join(F.broadcast(ok), ["h", "et"], "left_semi")
    a_side = b.select(F.col("user_id").alias("u"), "h", "et")
    c_side = b.select(F.col("user_id").alias("v"), F.col("h").alias("h2"), F.col("et").alias("et2"))
    e = (
        a_side.join(
            c_side,
            (F.col("h") == F.col("h2"))
            & (F.col("et") == F.col("et2"))
            & (F.col("u") < F.col("v")),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _COACT_W)
        .select("u", "v")
        # three consumers (e1/e2/e3): the bucket-capped pair join must run
        # once, not once per triangle leg (same idiom as _couser_edges)
        .localCheckpoint(eager=False)
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b1"))
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c1"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b1") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c1") == F.col("c3")))
        .select("a", "b1", "c1")
    )
    nodes = tri.select(
        F.explode(F.array("a", "b1", "c1")).alias("user_id")
    )
    return nodes.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_triangles"))


# --- scalable dense surrogate keys ------------------------------------------
@query(
    "surrogate_keys_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
    FROM orders
    """,
)
def surrogate_keys_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense deterministic 0..n-1 ids in key order via the range-partition +
    offset-broadcast decomposition (operators/scale.py::dense_ids) — the
    oracle states the single-window semantics a distributed engine must NOT
    execute literally (one-task global sort); equality proves the
    decomposition exact."""
    from ..operators.scale import dense_ids

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return dense_ids(o, ["o_orderkey"]).select("o_orderkey", "row_id")

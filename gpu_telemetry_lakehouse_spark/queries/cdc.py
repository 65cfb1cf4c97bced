"""Change-data-capture derivation and preference-frontier (skyline) queries.

``cdc_snapshot_diff`` is the batch twin of a lakehouse change feed: diff the
keyed state of an entity table at two points in time and emit typed change
rows (insert / update / delete) — the shape a downstream incremental consumer
(reverse ETL, cache invalidation, CDC-to-Kafka) ingests. The reference is
full-refresh-only (flow_full_refresh.py:79-90); this is the per-entity delta
view of the same data.

``skyline_orders`` is the Pareto-frontier (non-dominated set) operator —
multi-objective top-k that ORDER BY cannot express. Implemented with the
distributive bucket decomposition so no stage ever holds more than a
day-bucket of candidates; the oracle states the textbook NOT EXISTS
domination semantics independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# Trailing-window entity state: a user is "live" at T iff they produced an
# event in (T - 7d, T]; their state value is the LAST event's value (ts then
# event_id as the deterministic tiebreak). T1/T2 chosen so the windows
# overlap: a user whose last event falls in the overlap and who stays quiet
# afterwards yields an unchanged state (no row) — all four branches exercised.
_T1 = "2024-01-15 00:00:00"
_T2 = "2024-01-18 00:00:00"
_WINDOW_DAYS = 7


def _state_at(ev: DataFrame, t: str) -> DataFrame:
    """Per-user last-event value within the trailing window ending at ``t``."""
    lo = F.lit(t).cast("timestamp") - F.expr(f"INTERVAL {_WINDOW_DAYS} DAYS")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.filter((F.col("ts") > lo) & (F.col("ts") <= F.lit(t).cast("timestamp")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("state_value"))
    )


def _state_sql(t: str) -> str:
    return f"""
        SELECT user_id, value AS state_value FROM (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts > TIMESTAMP '{t}' - INTERVAL {_WINDOW_DAYS} DAY
              AND ts <= TIMESTAMP '{t}'
        ) WHERE rn = 1
    """


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH s1 AS ({_state_sql(_T1)}), s2 AS ({_state_sql(_T2)})
    SELECT CASE WHEN s1.user_id IS NULL THEN 'insert'
                WHEN s2.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           COALESCE(s1.user_id, s2.user_id) AS user_id,
           s1.state_value AS old_value,
           s2.state_value AS new_value
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL
       OR s1.state_value IS DISTINCT FROM s2.state_value
    ORDER BY change_type, user_id
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff -> typed change rows (the CDC semantic tablog's
    ``changes_between`` applies to physical table versions, here derived
    purely relationally so the oracle can replay it).

    Scale: each state is one window-dedup over a TIME-BOUNDED slice (the
    trailing window makes the state |active users|-sized, not |history|);
    the diff is one shuffle on user_id. The value comparison is raw-double
    passthrough — no arithmetic, so engines agree bitwise."""
    ev = load_table(spark, sf_dir, "events")
    s1 = _state_at(ev, _T1).withColumnRenamed("state_value", "old_value")
    s2 = _state_at(ev, _T2).select(
        F.col("user_id").alias("u2"), F.col("state_value").alias("new_value")
    )
    joined = s1.join(s2, F.col("user_id") == F.col("u2"), "full_outer")
    change = (
        F.when(F.col("user_id").isNull(), F.lit("insert"))
        .when(F.col("u2").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        # IS DISTINCT FROM, not <>: a NULL-valued state transitioning to a
        # real value (or back) IS a change — plain inequality returns NULL
        # there and would silently drop the row (the concat_ws-class NULL
        # trap ADVICE r2 flagged elsewhere)
        .filter(
            F.col("user_id").isNull()
            | F.col("u2").isNull()
            | ~F.col("old_value").eqNullSafe(F.col("new_value"))
        )
        .select(
            "change_type",
            F.coalesce(F.col("user_id"), F.col("u2")).alias("user_id"),
            "old_value",
            "new_value",
        )
        .orderBy("change_type", "user_id")
    )


@query(
    "skyline_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM orders o
    WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM orders d
        WHERE d.o_totalprice >= o.o_totalprice
          AND d.o_orderdate >= o.o_orderdate
          AND (d.o_totalprice > o.o_totalprice OR d.o_orderdate > o.o_orderdate)
    )
    ORDER BY o.o_orderdate DESC, o.o_totalprice, o.o_orderkey
    """,
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (recency, totalprice) — both maximized; domination requires >= on both
    axes and strict on at least one. The multi-objective "best" set no
    single ORDER BY produces.

    The oracle is the textbook correlated NOT EXISTS; a distributed engine
    cannot run that O(n^2) form. Skyline is distributive —
    skyline(S) = skyline(union of per-bucket skylines) — so the plan
    decomposes by day bucket:
      1. per-day max price (|days| rows, map-side agg);
      2. M_later(day) = max price over strictly later days, a window over
         that tiny frame (broadcast back);
      3. candidate filter: price > M_later — every dominator of a candidate
         is itself a candidate, so step 4 is sound on candidates alone;
      4. within-day frontier among candidates: price must equal the max at
         its exact ts and exceed the max over strictly later ts that day
         (ts-distinct pre-agg keeps the window deterministic under ties).
    At 100 TB only step 1 touches the full table (one map-side-combinable
    shuffle); candidates are a per-day handful."""
    from ..operators.frontier import skyline_2d

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return skyline_2d(
        o,
        "o_orderdate",
        "o_totalprice",
        bucket=F.date_trunc("day", F.col("o_orderdate")),
    ).orderBy(F.col("o_orderdate").desc(), "o_totalprice", "o_orderkey")

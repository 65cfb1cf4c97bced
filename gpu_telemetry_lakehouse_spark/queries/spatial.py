"""Spatial radius join via grid partitioning — the distributed spatial-join
shape (GeoSpark/Sedona family) with exact-integer geometry.

A radius self-join ("all pairs of points within R") is quadratic done
naively; the scale recipe is GRID PARTITIONING: bucket points into R-sized
cells, explode ONE side to its 3x3 cell neighborhood, equi-join on the cell
key (any pair within R is at most one cell apart, so candidate recall is
exact by construction), verify with the true distance. Each qualifying pair
is discovered exactly once: through the probe's exploded neighborhood
covering the build point's home cell, deduped by id order.

The tables carry no coordinates, so points are md5-derived integers on a
100k x 100k grid (deterministic, the web.py synthetic-noise pattern) — and
INTEGER geometry is the point: dx² + dy² and the R² comparison are exact
BIGINT arithmetic, so the oracle hash-match covers the verify stage too,
with no trig/ulp caveats. Real lat/lon swaps the cell function for geohash
and the verify for haversine; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import md5_int
from .registry import query

_R = 500          # radius
_GRID = 100000    # coordinate domain [0, _GRID)

_PTS_SQL = f"""
    SELECT c_custkey AS pid,
           CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)
                AS BIGINT) % {_GRID} AS x,
           CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)
                AS BIGINT) % {_GRID} AS y
    FROM customer
"""


@query(
    "grid_radius_join",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    probe AS (
        SELECT pid, x, y,
               (x // {_R}) + dx AS cx, (y // {_R}) + dy AS cy
        FROM pts,
             unnest([-1, 0, 1]) AS ox(dx),
             unnest([-1, 0, 1]) AS oy(dy)
    ),
    build AS (
        SELECT pid, x, y, x // {_R} AS cx, y // {_R} AS cy FROM pts
    ),
    pairs AS (
        SELECT a.pid AS a_pid, b.pid AS b_pid,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM probe a JOIN build b
          ON a.cx = b.cx AND a.cy = b.cy AND a.pid < b.pid
    )
    SELECT CAST(d2 * 4 // ({_R} * {_R}) AS BIGINT) AS annulus,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(a_pid + b_pid) AS BIGINT) AS sum_pair_ids,
           CAST(MIN(d2) AS BIGINT) AS min_d2,
           CAST(MAX(d2) AS BIGINT) AS max_d2
    FROM pairs WHERE d2 <= {_R} * {_R}
    GROUP BY 1 ORDER BY annulus
    """,
)
def grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within radius R, grouped into four annuli by d².

    Probe side explodes to its 3x3 cell neighborhood (9 rows/point — the
    bounded dual of replicating the build side), build side keeps its home
    cell; the equi-join on (cx, cy) yields every candidate at most one cell
    apart, and dx²+dy² <= R² verifies in exact BIGINTs. Candidate volume is
    sum over cells of 9·|cell|·density — linear in points for bounded
    density, never points². Membership pinned via sum_pair_ids; the annulus
    histogram (d²·4 div R²) is integer arithmetic, so bucket edges cannot
    wobble.
    """
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    pts = c.select(
        F.col("c_custkey").alias("pid"),
        (md5_int(F.concat(k, F.lit("x"))) % _GRID).alias("x"),
        (md5_int(F.concat(k, F.lit("y"))) % _GRID).alias("y"),
    ).localCheckpoint(eager=False)  # probe + build consumers
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = (
        pts.select("pid", "x", "y", F.explode(off).alias("dx"))
        .select("pid", "x", "y", "dx", F.explode(off).alias("dy"))
        .select(
            "pid",
            "x",
            "y",
            (F.floor(F.col("x") / _R) + F.col("dx")).alias("cx"),
            (F.floor(F.col("y") / _R) + F.col("dy")).alias("cy"),
        )
    )
    build = pts.select(
        F.col("pid").alias("b_pid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / _R).alias("cx"),
        F.floor(F.col("y") / _R).alias("cy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    pairs = (
        probe.join(build, ["cx", "cy"])
        .where(F.col("pid") < F.col("b_pid"))
        .select(
            F.col("pid").alias("a_pid"), F.col("b_pid"), d2.alias("d2")
        )
        .where(F.col("d2") <= _R * _R)
    )
    return (
        pairs.groupBy(
            F.floor(F.col("d2") * 4 / (_R * _R)).cast("long").alias("annulus")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a_pid") + F.col("b_pid"))
            .cast("long")
            .alias("sum_pair_ids"),
            F.min("d2").cast("long").alias("min_d2"),
            F.max("d2").cast("long").alias("max_d2"),
        )
        .orderBy("annulus")
    )


@query(
    "grid_nearest_neighbor",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    probe AS (
        SELECT pid, x, y,
               (x // {_R}) + dx AS cx, (y // {_R}) + dy AS cy
        FROM pts,
             unnest([-1, 0, 1]) AS ox(dx),
             unnest([-1, 0, 1]) AS oy(dy)
    ),
    build AS (
        SELECT pid, x, y, x // {_R} AS cx, y // {_R} AS cy FROM pts
    ),
    cand AS (
        SELECT a.pid, b.pid AS b_pid,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM probe a JOIN build b
          ON a.cx = b.cx AND a.cy = b.cy AND a.pid <> b.pid
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= {_R} * {_R}
    ),
    nn AS (
        SELECT pid, b_pid, d2,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, b_pid) AS rk
        FROM cand
    ),
    n AS (SELECT COUNT(*) AS n_points FROM pts)
    SELECT n.n_points,
           CAST(COUNT(best.pid) AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM(pid + b_pid), 0) AS BIGINT) AS sum_nn_ids,
           CAST(COALESCE(SUM(d2), 0) AS BIGINT) AS sum_d2,
           CAST(COALESCE(MIN(d2), 0) AS BIGINT) AS min_d2
    FROM n LEFT JOIN (SELECT * FROM nn WHERE rk = 1) best ON TRUE
    GROUP BY n.n_points
    """,
)
def grid_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor within R for every point (grid NN join).

    Same 3x3-neighborhood candidates as the radius join, directed (each
    point probes for ITS neighbor); the argmin is min(struct(d2, pid)) —
    deterministic tie-break without a per-point sort window. Points whose
    true NN is farther than R report unmatched (production expands the
    ring; one ring bounds candidate volume, which is the scale contract).
    All distances exact BIGINTs; membership pinned via sum_nn_ids.
    """
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    pts = c.select(
        F.col("c_custkey").alias("pid"),
        (md5_int(F.concat(k, F.lit("x"))) % _GRID).alias("x"),
        (md5_int(F.concat(k, F.lit("y"))) % _GRID).alias("y"),
    ).localCheckpoint(eager=False)
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = (
        pts.select("pid", "x", "y", F.explode(off).alias("dx"))
        .select("pid", "x", "y", "dx", F.explode(off).alias("dy"))
        .select(
            "pid",
            "x",
            "y",
            (F.floor(F.col("x") / _R) + F.col("dx")).alias("cx"),
            (F.floor(F.col("y") / _R) + F.col("dy")).alias("cy"),
        )
    )
    build = pts.select(
        F.col("pid").alias("b_pid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / _R).alias("cx"),
        F.floor(F.col("y") / _R).alias("cy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    cand = (
        probe.join(build, ["cx", "cy"])
        .where(F.col("pid") != F.col("b_pid"))
        .select("pid", "b_pid", d2.alias("d2"))
        .where(F.col("d2") <= _R * _R)
    )
    best = cand.groupBy("pid").agg(
        F.min(F.struct("d2", "b_pid")).alias("nn")
    ).select("pid", F.col("nn.d2").alias("d2"), F.col("nn.b_pid").alias("b_pid"))
    n = pts.agg(F.count(F.lit(1)).alias("n_points"))
    agg = best.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.coalesce(F.sum(F.col("pid") + F.col("b_pid")), F.lit(0))
        .cast("long")
        .alias("sum_nn_ids"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("long").alias("sum_d2"),
        F.coalesce(F.min("d2"), F.lit(0)).cast("long").alias("min_d2"),
    )
    return F.broadcast(n).crossJoin(agg).select(
        "n_points", "n_matched", "sum_nn_ids", "sum_d2", "min_d2"
    )

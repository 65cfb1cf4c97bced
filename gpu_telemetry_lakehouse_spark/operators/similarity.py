"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n·q), fine when the query set
is small enough to broadcast. Scale path: IVF (inverted-file) — k-means-lite
centroids, vectors bucketed by nearest centroid, queries probe the nearest
``n_probe`` buckets only. Both are pure DataFrame ops (zip_with/aggregate
fold the dot products JVM-side; no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import cosine, dot, dot_raw


def with_norm(
    df: DataFrame, vec_col: str = "embedding", out_vec: str = "v", out_norm: str = "nrm"
) -> DataFrame:
    """Per-row projection of (cast-to-double vector, L2 norm). Pair joins then
    compute cosine as dot(v_a, v_b) / (nrm_a * nrm_b) — one array fold per
    pair instead of three, with the cast paid once per row, not per pair."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(out_vec, v).withColumn(
        out_norm, F.sqrt(dot_raw(out_vec, out_vec))
    )


def normalize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize once so cosine becomes a plain dot product downstream."""
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(dot(v, v))
    return df.withColumn(vec_col, F.transform(v, lambda x: x / norm))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set against the vector scan.

    One pass over ``vectors`` (the 100 TB side), no shuffle of vector data —
    the only exchange is the per-query top-k reduction.
    """
    q = with_norm(queries, vec_col, "q_vec", "q_nrm").select(
        F.col(id_col).alias("query_id"), "q_vec", "q_nrm"
    )
    v = with_norm(vectors, vec_col, "n_vec", "n_nrm").select(id_col, "n_vec", "n_nrm")
    scored = v.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot_raw("n_vec", "q_vec") / (F.col("n_nrm") * F.col("q_nrm")), 6
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """K-means-lite for IVF: deterministic seeding (first K vectors by id),
    Lloyd iterations as posexplode->avg aggregations. Returns (cluster, centroid).

    At 100 TB run this on a sample — centroid quality needs only ~1e6 rows.
    """
    v = vectors.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    centroids = (
        v.orderBy(id_col)
        .limit(n_clusters)
        .select(F.col("v").alias("c"))
        .withColumn("cluster", F.row_number().over(W.orderBy(F.col("c"))) - 1)
    )
    for _ in range(n_iter):
        assigned = _assign(v, centroids)
        centroids = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("x"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("px"))
            .select("cluster", F.col("px.x").alias("c"))
        )
    return centroids


def _assign(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector (broadcast centroids, argmin of -dot)."""
    scored = v.join(F.broadcast(centroids)).select(
        "vec_id", "v", "cluster", dot("v", "c").alias("d")
    )
    w = W.partitionBy("vec_id").orderBy(F.col("d").desc(), "cluster")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cluster")
    )


def ivf_topk(
    spark: SparkSession,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` nearest centroid buckets.

    Scan cost drops to ~n_probe/n_clusters of brute force; recall depends on
    how clustered the corpus is (invariant: a query always finds itself —
    its own bucket is probed by construction).
    """
    nv = normalize(vectors, vec_col)
    v = nv.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    centroids = kmeans_centroids(nv, n_clusters=n_clusters, vec_col=vec_col, id_col=id_col)
    bucketed = _assign(v, centroids)

    q = normalize(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    q_probe = (
        q.join(F.broadcast(centroids))
        .select("query_id", "q_vec", "cluster", dot("q_vec", "c").alias("d"))
        .withColumn("rn", F.row_number().over(W.partitionBy("query_id").orderBy(F.col("d").desc(), "cluster")))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "cluster")
    )
    scored = bucketed.join(F.broadcast(q_probe), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot("v", "q_vec"), 6).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )

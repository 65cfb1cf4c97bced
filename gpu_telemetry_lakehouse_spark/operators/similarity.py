"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n·q), fine when the query set
is small enough to broadcast. Scale path: IVF (inverted-file) — k-means-lite
centroids, vectors bucketed by nearest centroid, queries probe the nearest
``n_probe`` buckets only. Both are pure DataFrame ops (zip_with/aggregate
fold the dot products JVM-side; no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import dot_raw


def with_norm(
    df: DataFrame, vec_col: str = "embedding", out_vec: str = "v", out_norm: str = "nrm"
) -> DataFrame:
    """Per-row projection of (cast-to-double vector, L2 norm). Pair joins then
    compute cosine as dot(v_a, v_b) / (nrm_a * nrm_b) — one array fold per
    pair instead of three, with the cast paid once per row, not per pair.

    NULL and zero-norm vectors are DROPPED: a zero vector has no direction,
    so every cosine against it is undefined — left in, it divides the whole
    job by zero under ANSI (9 of 13 embedding queries died on a
    zero-vector corpus sweep). Dead/padding embeddings are excluded from
    similarity search the way NULL metrics are excluded from aggregates;
    on a clean corpus the filter is a no-op (and the oracle gate unaffected)."""
    v = F.col(vec_col).cast("array<double>")
    return (
        df.filter(F.col(vec_col).isNotNull())
        .withColumn(out_vec, v)
        .withColumn(out_norm, F.sqrt(dot_raw(out_vec, out_vec)))
        .filter(F.col(out_norm) > 0)
    )


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
    # Ragged-dimension exclusion (round-9 class): zip_with over vectors of
    # DIFFERENT lengths NULL-pads, so their dot — and cosine — is NULL.
    # Cosine across dimensions is undefined (same footing as the zero-norm
    # exclusion above); left in, a NULL-cos pair could occupy a rank slot
    # whenever a query has fewer than k same-dimension neighbors. Free on
    # clean corpora (no exchange, never matches). DuckDB instead REFUSES
    # mismatched dims (list_dot_product raises) — a pinned engine-parity
    # divergence: we exclude, the oracle fails loud; neither is silent.
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.filter(F.col("cos_sim").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def require_finite_centroids(
    centroids: list[list[float]], what: str = "centroids"
) -> None:
    """Typed fail-loud for the r8 NaN/Inf-embeddings degenerate class: a
    non-finite fitted centroid means the corpus carries NaN/Inf embedding
    components — every downstream assignment would be garbage (and the
    string-literal plan form is not even parseable: repr(nan)+'D' reads as
    a COLUMN named nanD). Raise the diagnosable ValueError at the single
    point centroids become plan literals, which covers every fit path
    (sampled driver k-means, distributed k-means, PQ codebooks)."""
    import math

    for ci, c in enumerate(centroids):
        for x in c:
            if not math.isfinite(x):
                raise ValueError(
                    f"{what}[{ci}] has a non-finite component ({x!r}): input "
                    "embeddings carry NaN/Inf — filter non-finite vectors "
                    "before fitting"
                )


def _centroid_dots(vec: Column, centroids: list[list[float]]) -> Column:
    """``array<double>`` of v·c_j for every centroid, as ONE transform over a
    literal ``array<array<double>>``. The naive form — k separate unrolled
    ``aggregate(zip_with(...))`` expressions — costs the analyzer/codegen k
    higher-order-function subtrees per reference; a single lambda over the
    nested literal keeps the plan O(1) operators with the centroid VALUES as
    data, which measurably cuts per-query planning latency (the dominant
    cost of the IVF query at bench scale) without changing the arithmetic:
    same left-to-right fold per centroid, bit-identical doubles.
    """
    require_finite_centroids(centroids)
    # ONE parsed SQL literal, not k*dim F.lit py4j calls: building the
    # nested array element-by-element costs ~0.5ms of py4j latency per
    # element (~1.1s for 8x256 centroids, measured) while parsing the
    # equivalent SQL string costs ~3ms + ~0.1s analysis. repr(float) is the
    # shortest round-tripping decimal and Spark's parser is correctly
    # rounding, so the literal doubles are bit-identical to F.lit's.
    inner = ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
        for c in centroids
    )
    cents = F.expr(f"array({inner})")
    return F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        ),
    )


def _assign_expr(centroids: list[list[float]]) -> Column:
    """Row-local nearest-centroid expression over LITERAL centroids.

    Centroids are tiny by construction (k × dim doubles), so they ride into
    the plan as literals: assignment costs zero joins, zero windows, zero
    shuffles — it is a projection the parquet scan streams through. Ties
    resolve to the lowest cluster id (array_position finds the first max).
    """
    scores = _centroid_dots(F.col("v"), centroids)
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def assign_clusters_vectorized(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment via Arrow-batched numpy matmul — the
    large-k scale path.

    The literal-expression form (``_assign_expr``) evaluates k array folds
    per row inside codegen; fine for a coarse quantizer (k ≤ ~100) but the
    expression grows O(k·dim) and per-row interpreted folds lose to BLAS as
    k rises. Here the k×dim centroid matrix ships by value in the closure
    (kilobytes), each Arrow batch computes one (batch × dim)·(dim × k)
    float64 matmul, and argmax picks the cluster — same first-max tie-break
    as ``array_position`` (numpy argmax). Still a map-side projection: zero
    joins, zero shuffles, and the schema passes every other column through
    untouched.
    """
    import numpy as np

    from .linalg import stack_uniform

    C = stack_uniform(centroids, "assign_clusters_vectorized centroids").astype(
        np.float64
    ).T  # (dim, k)
    fields = [f for f in df.schema.fields if f.name != out_col]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.IntegerType())])

    def assign(it):
        from .linalg import stack_uniform

        for pdf in it:
            V = stack_uniform(
                pdf[vec_col].to_numpy(), "assign_clusters_vectorized"
            ).astype(np.float64)  # (n, dim)
            if V.shape[1] != C.shape[0]:
                raise ValueError(
                    f"assign_clusters_vectorized: batch embedding dimension "
                    f"{V.shape[1]} != centroid dimension {C.shape[0]} — "
                    "ragged embedding column"
                )
            pdf = pdf.copy()
            pdf[out_col] = (V @ C).argmax(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, out_schema)


# Above this k, ivf_topk switches corpus bucketing from the literal codegen
# expression to the Arrow/BLAS path. Query-side probe ranking always stays
# literal: the query set is driver-sized.
LITERAL_ASSIGN_MAX_K = 100


def kmeans_centroids(
    vectors: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 100_000,
) -> list[list[float]]:
    """K-means-lite for IVF, fit on a collected sample (the FAISS-style coarse
    quantizer recipe): a deterministic hash-threshold filter
    (``md5(id) < sample_rows/corpus_rows``) selects ~``sample_rows``
    unit-normalized vectors — a narrow scan, unlike ``orderBy(id).limit``
    which heap-selects over the WHOLE corpus — then Lloyd iterations run
    in numpy on the driver — centroid quality needs ~1e5-1e6 rows no matter
    how big the corpus is, and driver-side iterations avoid re-planning the
    k × dim literal assignment expression once per iteration. The collected
    subset is sorted by id, so the fit is independent of partitioning and
    scheduling (property-tested in tests/test_properties.py).

    Math per iteration (mirrors the distributed form exactly): assign by
    argmax(v·c) with first-max tie-break, update as the mean of UNIT vectors
    per cluster (spherical k-means); empty clusters keep their centroid.
    The k × dim result stays kilobytes regardless of corpus size.
    """
    import numpy as np

    # One narrow single-column scan to size the sampling threshold (count
    # does read the column — parquet metadata answers only bare count(*)
    # with aggregate pushdown on; treat this as a cheap-but-real pass).
    n = vectors.select(id_col).count()
    if n > sample_rows:
        # 60-bit md5 of the id vs the scaled fraction: a per-row uniform
        # deterministic coin, independent of layout; E[|sample|] = sample_rows.
        thresh = int(sample_rows / n * (1 << 60))
        frac = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
        vectors = vectors.filter(frac < F.lit(thresh))
    rows = (
        with_norm(vectors, vec_col)
        .orderBy(id_col)  # sorts only the ~sample_rows survivors
        .select(F.transform("v", lambda x: x / F.col("nrm")).alias("u"))
        .collect()
    )
    from .linalg import stack_uniform

    U = stack_uniform(
        [r.u for r in rows], "centroid sample"
    ).astype(np.float64)  # unit vectors
    cents = U[:n_clusters].copy()
    for _ in range(n_iter):
        # assignment uses raw sample vectors' direction == unit vectors here;
        # argmax over dots, numpy argmax = first max (same as array_position)
        assign = (U @ cents.T).argmax(axis=1)
        for c in range(n_clusters):
            members = U[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def ivf_topk(
    spark: SparkSession,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` nearest centroid buckets.

    Scan cost drops to ~n_probe/n_clusters of brute force; recall depends on
    how clustered the corpus is (invariant: a query always finds itself —
    its own bucket is probed by construction, since bucketing and probing
    share the same argmax-over-centroid-dots expression).

    Plan shape at 100 TB: centroid fit on a sample (one narrow shuffle per
    Lloyd iteration), bucketing as a map-side projection over the corpus
    scan, probe lists computed row-locally per query, then ONE broadcast
    equi-join on cluster id + per-query top-k reduction.
    """
    v = with_norm(vectors, vec_col).select(F.col(id_col), "v", "nrm")
    cents = centroids or kmeans_centroids(
        vectors, n_clusters=n_clusters, vec_col=vec_col, id_col=id_col
    )
    if len(cents) <= LITERAL_ASSIGN_MAX_K:
        bucketed = v.withColumn("cluster", _assign_expr(cents))
    else:
        bucketed = assign_clusters_vectorized(v, cents)

    q = with_norm(queries, vec_col, "q_vec", "q_nrm").select(
        F.col(id_col).alias("query_id"), "q_vec", "q_nrm"
    )
    # row-local probe list: sort (−dot, cluster) structs, slice top n_probe
    qdots = _centroid_dots(F.col("q_vec"), cents)
    ranked = F.array_sort(
        F.transform(
            qdots,
            lambda d, j: F.struct((-d).alias("negd"), j.cast("int").alias("cluster")),
        )
    )
    q_probe = q.select(
        "query_id",
        "q_vec",
        "q_nrm",
        F.explode(F.slice(ranked, 1, n_probe)["cluster"]).alias("cluster"),
    )
    scored = bucketed.join(F.broadcast(q_probe), "cluster").filter(
        F.col(id_col) != F.col("query_id")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot_raw("v", "q_vec") / (F.col("nrm") * F.col("q_nrm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 (Rademacher) hyperplane matrix for sign-LSH.

    Charikar's SimHash-for-cosine: the probability two vectors land on the
    same side of a random hyperplane is 1 − θ/π, so agreeing sign bits ≈
    high cosine. ±1 entries are a valid sampling of the hyperplane
    distribution and keep every dot product a sum of exactly-representable
    negations — the same literal matrix is inlined into the Spark plan and
    the DuckDB oracle SQL, so both engines evaluate identical arithmetic.
    Derivation is content-addressed (md5 of "plane:dim"), not seeded RNG:
    stable across processes, library versions, and re-runs.
    """
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest(), 16) & 1 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_code(vec: Column, planes: list[list[float]]) -> Column:
    """Pack sign(v·plane_p) bits into one integer bucket code (row-local).

    One transform over the literal plane matrix + one fold to pack bits —
    not per-plane unrolled subtrees (see ``_centroid_dots`` rationale)."""
    dots = _centroid_dots(vec, planes)
    weights = F.array(*[F.lit(1 << p).cast("long") for p in range(len(planes))])
    return F.aggregate(
        F.zip_with(
            dots,
            weights,
            lambda d, w: F.when(d > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_neardup_pairs(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN near-dup pairs via sign-LSH bucketing + exact cosine rerank.

    The scale shape: the code is a row-local projection (no data movement),
    the candidate join is an ordinary equi-join on an 8-bit bucket key —
    one shuffle of (id, vector, norm, code) — and exact cosine is computed
    only inside buckets, so the O(n²) pair space never materializes. With
    n_planes=8, expected collision rate for unrelated vectors is the
    bucket-count reciprocal (1/256); near-duplicates (θ→0) collide with
    probability (1 − θ/π)^8 → 1. Recall is tunable: more planes = fewer
    false candidates, lower recall per table (real deployments OR several
    such tables; one table keeps the oracle SQL small).
    """
    coded = with_norm(emb, vec_col).withColumn(
        "code", lsh_code(F.col("v"), hyperplane_signs(n_planes, dim))
    )
    a = coded.select(
        F.col(id_col).alias("id_a"), F.col("code"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = coded.select(
        F.col(id_col).alias("id_b"), F.col("code").alias("code_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, (F.col("code") == F.col("code_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos_sim", F.round(dot_raw("va", "vb") / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "code", "cos_sim")
    )


def cosine_topk_vectorized(
    vectors: DataFrame,
    queries_pdf,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine, Arrow/numpy path: the query matrix ships to
    workers by value inside the closure; each Arrow batch scores against ALL
    queries in one float64 matmul and emits only its per-batch top-k per
    query.

    Same answer as ``cosine_topk`` (a global winner is necessarily in its
    own batch's top-k, so batch-partials are a lossless superset), but the
    exchange shrinks from n_vectors x n_queries scored rows to
    n_batches x n_queries x k candidates — at 100 TB the shuffle carries
    kilobytes per task instead of the scan. The matmul also replaces
    per-row higher-order-function evaluation with BLAS over the whole
    batch, which is the throughput path when the vector side is wide.

    ``queries_pdf`` is a small pandas frame (id_col, vec_col) — the query
    set is inherently driver-sized (it's the thing a user asks about).
    """
    import numpy as np
    import pandas as pd

    # same degenerate-vector contract as with_norm: NULL / zero-norm rows
    # have no direction and are excluded rather than dividing by zero
    queries_pdf = queries_pdf[queries_pdf[vec_col].notna()]
    from .linalg import stack_uniform

    qids = queries_pdf[id_col].to_numpy()
    Q = stack_uniform(
        queries_pdf[vec_col].to_numpy(), "cosine_topk_vectorized queries"
    ).astype(np.float64)  # (q, d)
    qn = np.sqrt((Q * Q).sum(axis=1))  # (q,)
    qids, Q, qn = qids[qn > 0], Q[qn > 0], qn[qn > 0]

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(it):
        for pdf in it:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            B = stack_uniform(
                pdf[vec_col].to_numpy(), "cosine_topk_vectorized scan"
            ).astype(np.float64)  # (n, d)
            if B.shape[1] != Q.shape[1]:
                raise ValueError(
                    f"cosine_topk_vectorized: scan batch dimension "
                    f"{B.shape[1]} != query dimension {Q.shape[1]} — "
                    "ragged embedding column"
                )
            bn = np.sqrt((B * B).sum(axis=1))
            ids, B, bn = ids[bn > 0], B[bn > 0], bn[bn > 0]
            if not len(ids):
                continue
            cos = np.round((B @ Q.T) / (bn[:, None] * qn[None, :]), 6)
            frames = []
            for j in range(len(qids)):
                keep = ids != qids[j]
                cj, ij = cos[keep, j], ids[keep]
                # same tie-break as the global rank: cos desc, id asc
                top = np.lexsort((ij, -cj))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[j],
                            "neighbor_id": ij[top],
                            "cos_sim": cj[top],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    partial = vectors.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int = 100_000,
    cap_planes: int = 8,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup of an
    embedding corpus — cluster with a coarse quantizer, then WITHIN each
    cluster drop every vector that has a lower-id neighbor with cosine >=
    ``tau`` (the deterministic keep-lowest-id variant of "keep one point per
    semantic duplicate group"). Pairwise similarity is only ever computed
    inside a cluster, so the quadratic blow-up is bounded at (corpus /
    n_clusters)^2 per cluster instead of corpus^2 — the property that makes
    semantic dedup feasible at 100 TB, where all-pairs never materializes.

    Assignment is the same row-local literal-centroid projection the IVF
    index uses (zero shuffles); the pair join shuffles each cluster once on
    its cid. Returns (id, cluster, keep, capped) for every input vector.

    Skew bound (VERDICT r2): within-cluster pairing is quadratic in cluster
    size, so one hot cluster at 100 TB would blow up the join. Clusters
    larger than ``max_cluster_rows`` are therefore sub-bucketed by their
    sign-LSH code (``cap_planes`` Charikar hyperplanes) and pairs form only
    inside (cluster, sub-bucket) — expected pair count shrinks by
    2^cap_planes while near-duplicates (cosine→1) still collide with
    probability (1 − θ/π)^planes → 1. The cap is NOT silent: affected rows
    come back with capped=1 (and recall inside capped clusters is
    documented as approximate). Cluster sizes come from one tiny
    (≤ n_centroids rows) aggregate over the CHECKPOINTED assignment that
    broadcasts back — deliberately NOT a count window partitioned by
    cluster: that window's shuffle output becomes the pair join's input
    partitioning (hash(cluster) satisfies the (cluster, __sub) clustering),
    which caps pair-join parallelism at n_clusters tasks — and after AQE
    small-partition coalescing, at ONE task locally (measured 1.6 s → 3.3 s
    on the sf0.1 bench). The broadcast join keeps the scan's partitioning,
    so the quadratic within-cluster work spreads over every core.
    """
    v = with_norm(df, vec_col=vec_col)
    planes = hyperplane_signs(cap_planes, len(centroids[0]))
    sub = F.when(
        F.col("__cn") > max_cluster_rows, lsh_code(F.col("v"), planes)
    ).otherwise(F.lit(0).cast("long"))
    # lazy checkpoint: the assigned frame feeds THREE consumers (both
    # pair-join branches, the final keep join) and the k x dim literal
    # centroid projection is the expensive part — without truncation Spark
    # re-scans the corpus and re-projects per consumer (measured 6 scans,
    # 0 reused exchanges). One materialization (MEMORY_AND_DISK, spills at
    # cluster scale) makes every branch read the computed assignment.
    # single select per stage (not a withColumn chain): every DataFrame
    # transformation analyzes eagerly, and with k x dim literal centroids in
    # the tree each extra analysis pass costs real driver latency
    assigned = v.select(
        id_col, "v", "nrm", _assign_expr(centroids).alias("cluster")
    ).localCheckpoint(eager=False)
    # second pass over the checkpoint is k-row cheap (map-side partial agg)
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__cn"))
    assigned = assigned.join(F.broadcast(sizes), "cluster").select(
        id_col,
        "cluster",
        "v",
        "nrm",
        "__cn",
        sub.alias("__sub"),
        (F.col("__cn") > max_cluster_rows).cast("int").alias("capped"),
    )
    a = assigned.select(
        F.col("cluster"),
        F.col("__sub"),
        F.col(id_col).alias("__ia"),
        F.col("v").alias("__va"),
        F.col("nrm").alias("__na"),
    )
    b = assigned.select(
        F.col("cluster").alias("__cb"),
        F.col("__sub").alias("__sb"),
        F.col(id_col).alias("__ib"),
        F.col("v").alias("__vb"),
        F.col("nrm").alias("__nb"),
    )
    dropped = (
        a.join(
            b,
            (F.col("cluster") == F.col("__cb"))
            & (F.col("__sub") == F.col("__sb"))
            & (F.col("__ia") < F.col("__ib")),
        )
        .withColumn(
            "__cos", F.round(dot_raw("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6)
        )
        .filter(F.col("__cos") >= tau)
        .select(F.col("__ib").alias(id_col))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.when(F.col("__drop"), 0).otherwise(1).alias("keep"),
            "capped",
        )
    )


def topk_merge(prev_topk: DataFrame, delta_topk: DataFrame, k: int = 5) -> DataFrame:
    """Incremental top-k maintenance (the EDBT 2020 incremental-top-k
    family): when the corpus only GROWS, the standing top-k answer for a
    fixed query set is refreshed by scoring ONLY the delta — new vectors can
    displace old neighbors but never resurrect displaced ones — and merging
    the per-query candidate lists. Cost is proportional to the change, not
    the corpus: pair with the table format's change feed
    (``tablog.read_incremental``) so a 100 TB ANN result stays current at
    per-batch delta price instead of a nightly full re-scan.

    Both inputs are (query_id, neighbor_id, cos_sim[, rn]) shapes as
    produced by ``cosine_topk``; the merge re-ranks the union with the same
    (cos_sim desc, neighbor_id) tie-break and keeps k per query.
    """
    cols = ["query_id", "neighbor_id", "cos_sim"]
    both = prev_topk.select(*cols).unionByName(delta_topk.select(*cols))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def kmeans_fit_full(
    vectors: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Fully distributed Lloyd iterations over the ENTIRE corpus — the exact
    complement of ``kmeans_centroids``' sampled driver fit. Per iteration:
    nearest-centroid assignment as the row-local literal projection (zero
    shuffles), then the spherical update (mean of unit vectors per cluster)
    as ONE map-side-partial aggregation whose output is k × dim numbers —
    the only thing the driver ever holds. n_iter full passes, each a single
    narrow exchange: the 100 TB-shaped form when quantizer quality must come
    from all the data rather than a sample.

    Determinism: per-dimension sums stage through scaled longs
    (floor(u_i · 1e7 + 0.5) as BIGINT — exact, commutative), so the fitted
    centroids are bit-identical under any partitioning or scheduling, which
    a plain fp AVG cannot promise. Init = the n_clusters lowest-md5 ids
    (deterministic, layout-independent); empty clusters keep their centroid.

    Seed selection pre-filters with the same deterministic md5-threshold coin
    as ``kmeans_centroids`` before the k-row TakeOrdered: the global k
    lowest-md5 ids necessarily sit below any threshold that passes >= k rows
    (lexicographic md5 order == numeric order of the 60-bit prefix), so the
    heap-select runs over ~1000 survivors of a narrow scan instead of
    ordering the whole 100 TB corpus. The vector dimension is derived from
    the data (ADVICE r2: a caller-supplied dim silently truncated or
    NULL-poisoned the centroid update when it mismatched).
    """
    m = 10**7
    unit = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("__id"),
        F.transform("v", lambda x: x / F.col("nrm")).alias("u"),
    )
    n = unit.select("__id").count()
    target = max(1000, 50 * n_clusters)
    seed_pool = unit
    if n > target:
        from ..functions import md5_int

        thresh = int(target / n * (1 << 60))
        seed_pool = unit.filter(
            md5_int(F.col("__id").cast("string")) < F.lit(thresh)
        )
    seed_rows = (
        seed_pool.orderBy(F.md5(F.col("__id").cast("string")), "__id")
        .limit(n_clusters)
        .collect()
    )
    if len(seed_rows) < n_clusters:  # astronomically unlikely thin sample
        seed_rows = (
            unit.orderBy(F.md5(F.col("__id").cast("string")), "__id")
            .limit(n_clusters)
            .collect()
        )
    cents = [list(map(float, r.u)) for r in seed_rows]
    dim = len(cents[0]) if cents else 0
    for _ in range(n_iter):
        assigned = unit.withColumn(
            "cluster",
            (
                F.array_position(
                    _centroid_dots(F.col("u"), cents),
                    F.array_max(_centroid_dots(F.col("u"), cents)),
                )
                - 1
            ).cast("int"),
        )
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.floor(F.col("u")[i] * m + F.lit(0.5)).cast("long")).alias(f"s{i}")
            for i in range(dim)
        ]
        stats = {r["cluster"]: r for r in assigned.groupBy("cluster").agg(*aggs).collect()}
        for c in range(n_clusters):
            r = stats.get(c)
            if r and r["n"]:
                cents[c] = [r[f"s{i}"] / m / r["n"] for i in range(dim)]
    return cents

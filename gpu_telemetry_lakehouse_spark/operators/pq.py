"""Product quantization (PQ) for approximate nearest-neighbor search.

The FAISS-style memory-bound ANN tier (Jégou et al. 2011): split each
``dim``-vector into ``m`` subspaces, k-means each subspace into ``k``
centroids, and store per vector only the ``m`` centroid indices — 8 bytes
per vector at m=8/k=16 vs 256 bytes of raw float32, a 32× compression that
is what makes billion-vector indexes fit in RAM. Queries score candidates
with asymmetric distance computation (ADC): a per-query (m × k) lookup
table of exact subspace distances, summed over each vector's codes.

Scale design, mirroring this package's IVF/kmeans recipes
(operators/similarity.py):
- **Fit** collects a deterministic hash-threshold SAMPLE (sorted by id, so
  the fit is partition/scheduling independent) and runs per-subspace Lloyd
  on the driver — codebooks are m·k·(dim/m) doubles, kilobytes forever.
- **Encode** is a row-local projection over LITERAL codebooks (argmin of
  ||c||² − 2·v_sub·c per subspace): zero joins, zero shuffles, whole-stage
  codegen. The corpus streams through one pass.
- **Query** ships the (m × k) ADC table as a literal too; scoring is one
  array fold per row, then a per-query top-R reduction; an exact re-rank
  over the R candidates (broadcast join back to raw vectors) restores
  near-exact top-k quality. Nothing corpus-sized ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_int


def pq_fit(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 100_000,
    n_iter: int = 10,
) -> list[list[list[float]]]:
    """Fit per-subspace codebooks -> ``codebooks[m][k][dim/m]``.

    Deterministic: hash-threshold sample, sorted by id; Lloyd init takes k
    evenly spaced sample subvectors; argmin ties resolve to the lowest
    centroid index; empty clusters keep their centroid.
    """
    import numpy as np

    n = vectors.select(id_col).count()
    sampled = vectors.select(id_col, vec_col)
    if n > sample_rows:
        thresh = int((2**60) * (sample_rows / n))
        sampled = sampled.filter(md5_int(F.col(id_col).cast("string")) < thresh)
    rows = sampled.orderBy(id_col).collect()
    if len(rows) < k:
        # linspace over fewer than k sample rows would seed DUPLICATE
        # centroids (degenerate codebooks with no warning); an empty table
        # would index into nothing at all
        raise ValueError(
            f"pq_fit needs >= k={k} sample vectors, got {len(rows)}"
        )
    from .linalg import stack_uniform

    X = stack_uniform([r[1] for r in rows], "pq_fit sample").astype(np.float64)
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        idx = np.linspace(0, len(S) - 1, k).astype(int)
        C = S[idx].copy()
        for _ in range(n_iter):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)  # numpy argmin = first (lowest) index on ties
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books.append(C.tolist())
    return books


def _sub_code_expr(vec: Column, book: list[list[float]], j: int, sub: int) -> Column:
    """0-based nearest-centroid index for subspace ``j`` as one literal
    lambda: scores[k] = ||c_k||² − 2·v_sub·c_k (monotone in L2 distance);
    argmin via array_position of the min (first match -> lowest index)."""
    from .similarity import require_finite_centroids

    # NaN codebook entries poison every score (argmin over NaNs is
    # meaningless) — same typed fail-loud as the IVF literal path
    require_finite_centroids(book, what=f"codebooks[{j}]")
    lit_books = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
    s = F.slice(vec, j * sub + 1, sub).cast("array<double>")
    scores = F.transform(
        lit_books,
        lambda c: F.aggregate(
            F.zip_with(c, s, lambda a, b: a * a - 2.0 * a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One row-local pass: (id, codes array<int> of length m)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col)
    codes = F.array(*[_sub_code_expr(v, codebooks[j], j, sub) for j in range(m)])
    return vectors.select(F.col(id_col), codes.alias("codes"))


def _adc_query_struct(codebooks: list[list[list[float]]], q, qid) -> Column:
    """One query's (query_id, adc_dist) struct from its literal (m x k)
    ADC table — the per-row scoring expression shared by the single- and
    multi-query scan forms."""
    import numpy as np

    m = len(codebooks)
    sub = len(codebooks[0][0])
    table = [
        [
            float(((q[j * sub : (j + 1) * sub] - np.array(c)) ** 2).sum())
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lit_table = F.array(*[F.array(*[F.lit(x) for x in row]) for row in table])
    adc = F.aggregate(
        F.zip_with(
            lit_table,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.struct(F.lit(int(qid)).alias("query_id"), adc.alias("adc_dist"))


def _exact_dist_expr(queries: dict, vec_col: str) -> Column:
    """Per-row exact L2 distance to the row's query_id's literal query
    vector (CASE ladder over the bounded query set)."""
    import numpy as np

    expr = None
    for qid in sorted(queries):
        q = np.asarray(queries[qid], dtype=np.float64)
        qlit = F.array(*[F.lit(float(x)) for x in q])
        e = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), qlit,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cond = F.col("query_id") == int(qid)
        expr = F.when(cond, e) if expr is None else expr.when(cond, e)
    return expr


def _multi_topk(
    scored: DataFrame,
    vectors: DataFrame,
    queries: dict,
    k: int,
    rerank: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared tail of the multi-query ADC scans: two-level (salted) exact
    top-``rerank`` per query — the global top-R is a subset of the union of
    per-salt-bucket top-Rs, so no single window partition ever holds more
    than ~1/32 of a query's candidate stream (the single-query form's
    global-orderBy window put the WHOLE scan in one partition) — then the
    broadcast join-back to raw vectors for exact re-ranking."""
    from pyspark.sql import Window as W

    w1 = W.partitionBy("query_id", "sl").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    cands = (
        scored.withColumn("sl", F.pmod(F.xxhash64(F.col(id_col)), F.lit(32)))
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= rerank)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= rerank)
        .select(id_col, "query_id", "adc_dist")
    )
    w3 = W.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        vectors.join(F.broadcast(cands), id_col)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(_exact_dist_expr(queries, vec_col), 6).alias("exact_dist"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
        .withColumn("rn", F.row_number().over(w3))
        .filter(F.col("rn") <= k)
    )


def pq_adc_topk_multi(
    codes: DataFrame,
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    queries: dict,
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All anchor queries in ONE plan: the code table is scanned once with
    every query's literal ADC table evaluated per row (an explode of
    len(queries) scored structs), instead of one sequential job per query.
    Per-query results are bit-identical to looping ``pq_adc_topk`` and
    unioning: same ADC tables, same tie order (adc, id), same re-rank."""
    import numpy as np

    structs = [
        _adc_query_struct(codebooks, np.asarray(queries[qid], dtype=np.float64), qid)
        for qid in sorted(queries)
    ]
    scored = (
        codes.select(id_col, F.explode(F.array(*structs)).alias("qa"))
        .select(id_col, "qa.query_id", "qa.adc_dist")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    return _multi_topk(scored, vectors, queries, k, rerank, vec_col, id_col)


def pq_adc_topk(
    codes: DataFrame,
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    query,
    query_id,
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC scan + exact re-rank for one query vector (numpy array).

    The (m × k) distance table is computed driver-side from the RAW query
    (asymmetric: query is not quantized) and shipped as a literal; the scan
    cost per row is m array lookups. The top-``rerank`` ADC candidates then
    join back to their raw vectors (broadcast candidate ids) for exact L2
    ordering — the standard two-stage PQ recipe.
    """
    import numpy as np

    from pyspark.sql import Window as W

    q = np.asarray(query, dtype=np.float64)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    table = [
        [
            float(((q[j * sub : (j + 1) * sub] - np.array(c)) ** 2).sum())
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lit_table = F.array(*[F.array(*[F.lit(x) for x in row]) for row in table])
    adc = F.aggregate(
        F.zip_with(
            lit_table,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    cands = (
        codes.filter(F.col(id_col) != query_id)
        .select(id_col, adc.alias("adc_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= rerank)
        .select(id_col, "adc_dist")
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), qlit, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w2 = W.orderBy(F.col("exact_dist").asc(), F.col("neighbor_id").asc())
    return (
        vectors.join(F.broadcast(cands), id_col)
        .select(
            F.lit(int(query_id)).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(exact, 6).alias("exact_dist"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )


# --------------------------------------------------------------------------
# IVF-PQ: coarse inverted-file routing composed with PQ codes — the full
# FAISS IVFADC recipe. The coarse quantizer (operators/similarity.py
# centroids) prunes the scan to n_probe clusters; within them the ADC table
# scores 8-byte codes; the exact re-rank restores top-k quality. At 100 TB
# the codes table is also naturally PARTITIONED BY cluster, so the probe
# filter becomes partition pruning — the scan literally skips files.
# --------------------------------------------------------------------------


def ivfpq_encode(
    vectors: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One row-local pass -> (id, cluster, codes): coarse argmax-cosine
    cluster (literal centroids) + PQ codes (literal codebooks)."""
    from .similarity import _assign_expr, with_norm

    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = with_norm(vectors, vec_col, "v", "nrm")
    codes = F.array(
        *[_sub_code_expr(F.col(vec_col), codebooks[j], j, sub) for j in range(m)]
    )
    return v.select(
        F.col(id_col),
        _assign_expr(centroids).alias("cluster"),
        codes.alias("codes"),
    )


def ivfpq_topk_multi(
    encoded: DataFrame,
    vectors: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: dict,
    n_probe: int = 2,
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All anchor queries in ONE plan over the IVF-PQ code table: per-query
    coarse probes become one OR-of-(query, cluster-set) filter on the
    exploded scored stream, so the codes are scanned once for every query
    together. Bit-identical to looping ``ivfpq_topk`` (same probe sets, ADC
    tables, tie orders, re-rank)."""
    import numpy as np

    from .linalg import stack_uniform

    C = stack_uniform(centroids, "ivfpq centroids").astype(np.float64)
    structs, cond = [], None
    for qid in sorted(queries):
        q = np.asarray(queries[qid], dtype=np.float64)
        sims = (C @ q) / (np.linalg.norm(C, axis=1) * np.linalg.norm(q) + 1e-12)
        probes = [int(i) for i in np.argsort(-sims, kind="stable")[:n_probe]]
        structs.append(_adc_query_struct(codebooks, q, qid))
        c = (F.col("query_id") == int(qid)) & F.col("cluster").isin(probes)
        cond = c if cond is None else cond | c
    scored = (
        encoded.select(id_col, "cluster", F.explode(F.array(*structs)).alias("qa"))
        .select(id_col, "cluster", "qa.query_id", "qa.adc_dist")
        .filter(cond & (F.col(id_col) != F.col("query_id")))
        .drop("cluster")
    )
    return _multi_topk(scored, vectors, queries, k, rerank, vec_col, id_col)


def ivfpq_topk(
    encoded: DataFrame,
    vectors: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query,
    query_id,
    n_probe: int = 2,
    k: int = 10,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``n_probe`` nearest coarse clusters, ADC-score only their
    codes, exact re-rank the survivors. Probe selection is a driver-side
    numpy argmax over the (tiny) centroid matrix."""
    import numpy as np

    from pyspark.sql import Window as W

    from .linalg import stack_uniform

    q = np.asarray(query, dtype=np.float64)
    C = stack_uniform(centroids, "ivfpq centroids").astype(np.float64)
    sims = (C @ q) / (np.linalg.norm(C, axis=1) * np.linalg.norm(q) + 1e-12)
    probes = [int(i) for i in np.argsort(-sims, kind="stable")[:n_probe]]

    m = len(codebooks)
    sub = len(codebooks[0][0])
    table = [
        [
            float(((q[j * sub : (j + 1) * sub] - np.array(c)) ** 2).sum())
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lit_table = F.array(*[F.array(*[F.lit(x) for x in row]) for row in table])
    adc = F.aggregate(
        F.zip_with(
            lit_table,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    cands = (
        encoded.filter(
            F.col("cluster").isin(probes) & (F.col(id_col) != query_id)
        )
        .select(id_col, adc.alias("adc_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= rerank)
        .select(id_col, "adc_dist")
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), qlit, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w2 = W.orderBy(F.col("exact_dist").asc(), F.col("neighbor_id").asc())
    return (
        vectors.join(F.broadcast(cands), id_col)
        .select(
            F.lit(int(query_id)).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(exact, 6).alias("exact_dist"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )

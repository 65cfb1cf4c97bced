"""Distributed linear algebra over embedding columns: mean/Gram accumulation
and PCA projection.

Scale design: the only thing that ever crosses the cluster boundary is the
(dim × dim) Gram matrix and the dim-vector of column sums — a few KB at
dim=64 regardless of corpus size. Partials are computed per partition with
numpy (one BLAS syrk per Arrow batch beats 2,000+ codegen'd aggregate
expressions for the upper triangle), then reduced on the driver in partition
order. The projection back over the corpus is a row-local literal expression
(the kmeans/_centroid_dots pattern) — zero shuffles, whole-stage codegen.

Reference parity: the reference's ML layer is sklearn StandardScaler +
IsolationForest (ml/train_cluster_anomaly_model.py:35-52); PCA is the
§2.2 extension analogue for embedding feature pipelines.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stack_uniform(arrays, context: str) -> np.ndarray:
    """``np.stack`` with a diagnosed refusal on ragged input.

    Cosine/codebook/Gram math over mismatched vector dimensions is
    undefined, and numpy's own errors ("inhomogeneous shape", "all input
    arrays must have the same shape") never name the corpus defect. Every
    vector-stacking site in the engine funnels through here so a ragged
    embedding column fails loud with the actual diagnosis — on a clean
    corpus the length scan is a single O(n) pass over pointers, dwarfed by
    the stack copy itself."""
    sizes = {len(a) for a in arrays}
    if len(sizes) > 1:
        raise ValueError(
            f"{context}: embedding dimensions are inconsistent across rows "
            f"(sizes {sorted(sizes)[:8]}{'…' if len(sizes) > 8 else ''}) — "
            "a ragged embedding column cannot be scored; re-embed or filter "
            "to a single dimension first"
        )
    return np.stack(list(arrays))


def gram_stats(df: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """One pass over the corpus -> (n, column-sum vector, X^T X Gram matrix).

    Per-partition numpy partials (count, sum, Gram) ride back as one row per
    partition; the driver reduce is a sum of ~n_partitions small matrices,
    ordered by partition id (mapInPandas preserves partition order in the
    collect), so the result is run-to-run deterministic for a fixed layout.
    """
    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # dim is discovered from the first batch — no separate driver job
        # (a .first() probe would launch one extra Spark job per fit call)
        n = 0
        s = g = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = stack_uniform(pdf[vec_col].to_numpy(), "gram_stats").astype(
                np.float64
            )
            if s is None:
                d = X.shape[1]
                s = np.zeros(d, dtype=np.float64)
                g = np.zeros((d, d), dtype=np.float64)
            elif X.shape[1] != d:
                raise ValueError(
                    f"gram_stats: embedding dimension changed across batches "
                    f"({d} then {X.shape[1]}) — ragged embedding column"
                )
            n += X.shape[0]
            s += X.sum(axis=0)
            g += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(_partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError(f"gram_stats: no rows with a {vec_col!r} vector")
    dims = {len(r["s"]) for r in rows}
    if len(dims) > 1:
        raise ValueError(
            f"gram_stats: partitions disagree on embedding dimension "
            f"(sizes {sorted(dims)}) — ragged embedding column"
        )
    dim = len(rows[0]["s"])
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    g = np.sum([np.array(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    return n, s, g


def pca_components(
    df: DataFrame, k: int = 2, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA from the one-pass Gram stats: covariance = (G - n·mu·mu^T)/(n-1),
    eigendecomposition on the driver (dim × dim — O(dim^3) once, corpus-size
    independent). Returns (mean vector, k × dim components). Sign is fixed by
    making each component's largest-|coordinate| entry positive, so the
    decomposition is deterministic under eigenvector sign ambiguity."""
    n, s, g = gram_stats(df, vec_col)
    if n < 2:
        raise ValueError("pca_components needs at least 2 rows")
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = vecs[:, ::-1][:, :k].T  # k × dim, descending variance
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps


def project(
    df: DataFrame,
    mu: np.ndarray,
    comps: np.ndarray,
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Row-local projection (x - mu) @ comps^T as literal fold expressions —
    the fitted parameters ship by value in the plan (kilobytes), the corpus
    never shuffles, and the whole projection stays in codegen."""
    dim = len(mu)
    v = F.col(vec_col)
    out = df
    for i, comp in enumerate(comps):
        # sum_d comp[d] * (x[d] - mu[d])  ==  dot(comp, x) - dot(comp, mu)
        bias = float(np.dot(comp, mu))
        expr = None
        for d in range(dim):
            term = v.getItem(d).cast("double") * float(comp[d])
            expr = term if expr is None else expr + term
        out = out.withColumn(f"{prefix}{i + 1}", expr - F.lit(bias))
    return out

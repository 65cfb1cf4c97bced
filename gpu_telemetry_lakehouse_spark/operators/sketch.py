"""Sketch operators: bounded-memory summaries with an exact refine phase.

The pattern for holistic statistics at 100 TB: a map-side sketch bounds what
each task keeps in memory and what crosses the shuffle; a second, exact pass
runs only over the sketch's (small) candidate set, so the final answer is
EXACT — the approximation only risks extra candidates, never a wrong result.
That is what keeps these entries inside the DuckDB differential gate instead
of a weaker tolerance check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-items sketch: ≤ k counters per
    task, emitted as candidate keys.

    Guarantee (mergeable-summaries form): a key whose count in partition p
    exceeds n_p/(k+1) survives p's sketch. Any global key with count > n/k
    must exceed n_p/k > n_p/(k+1) in at least one partition (pigeonhole), so
    the union of partition candidates is a SUPERSET of the true heavy
    hitters — the exact recount pass can only discard, never miss.

    Memory per task is O(k); shuffle payload is ≤ k keys per partition —
    independent of data volume, which is the point at 100 TB.
    """
    field = df.schema[key_col]

    def sketch(it):
        counters = pd.Series(dtype="int64")
        for pdf in it:
            vc = pdf[key_col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                # subtract the (k+1)-th largest counter from all (batched
                # MG decrement, Agarwal et al. "Mergeable Summaries")
                d = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > d] - d
        yield pd.DataFrame({key_col: counters.index.to_series(index=None)})

    return df.select(key_col).mapInPandas(
        sketch, T.StructType([T.StructField(key_col, field.dataType)])
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact keys with count > n/k, computed sketch-first: MG candidates per
    partition, then an exact recount restricted to the (broadcast-small)
    candidate set. Two scans of the input, but no full-width groupBy shuffle:
    the only exchange moves candidate keys and their partial counts."""
    total = df.count()
    cands = misra_gries_candidates(df, key_col, k).distinct()
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total / k)
    )


# --- t-digest (mergeable quantile sketch) ------------------------------------
# Dunning & Ertl's merging t-digest with the k1 scale function: centroid
# sizes are bounded by 4*n*q*(1-q)/delta, so the tails stay near-exact while
# the middle compresses. Cluster protocol mirrors linalg.gram_stats: each
# partition builds a digest over its Arrow batches (numpy, no per-row
# Python), ships ONLY its centroid list (O(delta) doubles), and the driver
# merges partition digests by re-compressing the pooled list. What crosses
# the cluster boundary is constant-size per partition regardless of corpus
# size, and digests from different days/tables merge the same way — the
# property that makes pre-aggregated quantile rollups possible at 100 TB
# (unlike exact percentile, which shuffles every value).
#
# Determinism: pooled centroids are sorted by (mean, weight) before the
# driver compress, so the result is independent of partition arrival order.


def _compress(means, weights, delta: int):
    """One merging pass: sort by mean, sweep left-to-right, greedily absorb
    neighbors while the merged centroid's weight stays under the k1 size
    bound 4*n*q*(1-q)/delta at its prospective mid-quantile."""
    import numpy as np

    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    n = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0  # weight strictly left of the open centroid
    cm, cw = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + (cw + w) / 2.0) / n
        if cw + w <= max(1.0, 4.0 * n * q * (1.0 - q) / delta):
            cm = (cm * cw + m * w) / (cw + w)
            cw += w
        else:
            out_m.append(cm)
            out_w.append(cw)
            cum += cw
            cm, cw = m, w
    out_m.append(cm)
    out_w.append(cw)
    return np.array(out_m), np.array(out_w)


def tdigest_fit(df: DataFrame, col: str, delta: int = 100):
    """One pass over ``df[col]`` -> merged (means, weights) centroid arrays.

    Per-partition partials ride back as one row per partition; the driver
    re-compress is O(delta * n_partitions * log) — corpus-size independent.
    """
    import numpy as np

    def _partials(it):
        m = np.empty(0)
        w = np.empty(0)
        for pdf in it:
            x = pdf[col].to_numpy(dtype="float64")
            x = x[~pd.isna(x)]
            if not len(x):
                continue
            m = np.concatenate([m, x])
            w = np.concatenate([w, np.ones(len(x))])
            if len(m) > 8 * delta:
                m, w = _compress(m, w, delta)
        if len(m):
            m, w = _compress(m, w, delta)
            yield pd.DataFrame({"m": [m.tolist()], "w": [w.tolist()]})

    rows = (
        df.select(col)
        .mapInPandas(_partials, schema="m array<double>, w array<double>")
        .collect()
    )
    if not rows:
        import numpy as np

        return np.empty(0), np.empty(0)
    m = np.concatenate([np.array(r["m"]) for r in rows])
    w = np.concatenate([np.array(r["w"]) for r in rows])
    return _compress(m, w, delta)


def tdigest_quantile(means, weights, q: float) -> float:
    """Interpolated quantile from the centroid list (midpoint rule).

    An EMPTY digest (zero observations) has no order statistics: returns
    NaN — the defined no-data answer — rather than indexing into an empty
    centroid array."""
    import numpy as np

    if len(means) == 0:
        return float("nan")
    n = weights.sum()
    target = q * n
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    # convex-combination form, NOT a + f*(b-a): the latter cancels
    # catastrophically at f==1 when |a| >> |b| (a subnormal b comes back as
    # exactly 0.0 — a wrong ORDER STATISTIC, found by hypothesis). The
    # rounded combination can still land one ulp OUTSIDE [a, b] — at a==b
    # (0.4*M + 0.6*M != M for M near 1e6) that one ulp is a whole rank step
    # on discrete data (also hypothesis-found) — so clamp into the hull.
    a, b = means[i], means[i + 1]
    return float(min(max((1.0 - frac) * a + frac * b, a), b))


def tdigest_merge(digests, delta: int = 100):
    """Merge multiple (means, weights) digests into one by re-compressing the
    pooled centroid list — associative and commutative up to digest accuracy,
    which is what makes per-day/per-stream-epoch digests foldable into
    rollups without re-scanning raw data."""
    import numpy as np

    ms = [m for m, _ in digests if len(m)]
    ws = [w for _, w in digests if len(w)]
    if not ms:
        return np.empty(0), np.empty(0)
    return _compress(np.concatenate(ms), np.concatenate(ws), delta)


def tdigest_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    qs: list[float],
    delta: int = 100,
) -> DataFrame:
    """Per-group quantile estimates via one t-digest per group
    (``applyInPandas``): the sketch tier of exact grouped ``percentile``.

    Exact percentile shuffles EVERY value to its group and sorts; this
    shuffles values once (the same groupBy exchange) but each group then
    reduces to an O(delta) digest in its task — and unlike exact sort-based
    percentile the digests could be further pre-aggregated per partition
    and merged (``tdigest_merge``) for re-aggregatable rollup tables. Rank
    error vs exact is pinned in tests/test_sketch_tdigest.py.
    """
    import numpy as np

    out_fields = ", ".join(f"q{str(q).replace('.', '_')} double" for q in qs)
    gcols_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[col].to_numpy(dtype="float64")
        x = x[~pd.isna(x)]
        if not len(x):  # all-NULL group: _compress indexes means[0]
            return pd.DataFrame([list(key) + [None] * len(qs)])
        m, w = _compress(x, np.ones(len(x)), delta)
        row = list(key) + [float(tdigest_quantile(m, w, q)) for q in qs]
        return pd.DataFrame([row])

    return df.select(*group_cols, col).groupBy(*group_cols).applyInPandas(
        per_group, schema=f"{gcols_schema}, {out_fields}"
    )

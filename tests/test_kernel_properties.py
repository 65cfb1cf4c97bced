"""Property-based tests for the round-3 numeric kernels — pure driver-side
numpy, no Spark session needed: t-digest rank accuracy + mergeability under
arbitrary distributions, luma_grid resample bounds, and the BPE merge fold
against a reference implementation."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from gpu_telemetry_lakehouse_spark.operators.sketch import (
    _compress,
    tdigest_merge,
    tdigest_quantile,
)

# allow_subnormal=False: between 0.0 and the smallest subnormal (5e-324)
# there is NO representable midpoint — interpolating adjacent centroids
# ties-to-even down to 0.0, which sits one whole rank below, so the
# rank-error property is vacuously unsatisfiable at float resolution
# (hypothesis found exactly [0.0, 1.0, 1.0, 5e-324 x3]). Any NORMAL float
# interpolates fine; the digest itself is unaffected.
finite = st.floats(
    min_value=-1e6,
    max_value=1e6,
    allow_nan=False,
    allow_infinity=False,
    allow_subnormal=False,
)


@settings(max_examples=60, deadline=None)
@given(xs=st.lists(finite, min_size=5, max_size=400))
@example(
    xs=[0.0,
     0.0,
     0.0,
     0.0,
     0.0,
     0.0,
     999999.9999999999,
     999999.9999999999,
     999999.9999999999],
).via('discovered failure')
def test_tdigest_rank_error_bound(xs):
    x = np.array(xs, dtype=np.float64)
    m, w = _compress(x, np.ones(len(x)), delta=100)
    v = np.sort(x)
    n = len(v)
    assert w.sum() == n
    for q in (0.1, 0.5, 0.9):
        est = tdigest_quantile(m, w, q)
        lo = np.searchsorted(v, est, side="left") / n
        hi = np.searchsorted(v, est, side="right") / n
        err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
        # generous bound for tiny n (rank granularity 1/n dominates)
        assert err <= max(0.05, 1.5 / n), (q, est, lo, hi)


@settings(max_examples=40, deadline=None)
@given(
    a=st.lists(finite, min_size=3, max_size=200),
    b=st.lists(finite, min_size=3, max_size=200),
)
def test_tdigest_merge_close_to_whole(a, b):
    """digest(A) ⊕ digest(B) must estimate like digest(A ∪ B): same total
    weight, median within combined rank tolerance."""
    xa, xb = np.array(a), np.array(b)
    da = _compress(xa, np.ones(len(xa)), 100)
    db = _compress(xb, np.ones(len(xb)), 100)
    m, w = tdigest_merge([da, db], 100)
    whole = np.sort(np.concatenate([xa, xb]))
    n = len(whole)
    assert w.sum() == n
    est = tdigest_quantile(m, w, 0.5)
    lo = np.searchsorted(whole, est, side="left") / n
    hi = np.searchsorted(whole, est, side="right") / n
    err = 0.0 if lo <= 0.5 <= hi else min(abs(lo - 0.5), abs(hi - 0.5))
    assert err <= max(0.05, 2.0 / n), (est, lo, hi)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    oh=st.integers(1, 10),
    ow=st.integers(1, 10),
    seed=st.integers(0, 10_000),
)
def test_luma_grid_bounds_and_constancy(h, w, oh, ow, seed):
    """Every resampled cell is a mean of source luma -> stays inside the
    source's [min, max]; a constant image resamples to a constant grid at
    ANY scale factor (the exact property the old scatter form violated on
    upscale)."""
    from gpu_telemetry_lakehouse_spark.operators.media_codecs import luma_grid

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    g = luma_grid(img, ow, oh)
    assert g.shape == (oh * ow,)
    f = img.astype(np.float32) / 255.0
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    assert g.min() >= luma.min() - 1e-5 and g.max() <= luma.max() + 1e-5
    flat = np.full((h, w, 3), 200, dtype=np.uint8)
    gf = luma_grid(flat, ow, oh)
    assert np.allclose(gf, gf[0])


def _bpe_merge_ref(symbols, a, b):
    """Reference greedy left-to-right merge walk (Sennrich)."""
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@settings(max_examples=80, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=12),
    pair=st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
)
def test_bpe_fold_matches_reference_walk(word, pair):
    """The string fold used on BOTH engines (queries/lm.py _BPE_FOLD_*)
    must equal the classic merge walk for single-char symbol alphabets."""
    a, b = pair
    symbols = list(word)
    # replicate the fold: seed with first symbol, walk the rest
    acc = symbols[0]
    for x in symbols[1:]:
        last_is_a = acc == a or acc.endswith(" " + a)
        if x == b and last_is_a:
            acc = acc + b
        else:
            acc = acc + " " + x
    got = acc.split(" ")
    want = _bpe_merge_ref(symbols, a, b)
    assert got == want, (word, pair, got, want)

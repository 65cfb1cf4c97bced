"""t-digest invariants: rank-error bound vs exact order statistics, merge
determinism under repartitioning, and centroid-count bound."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    m, w = SK.tdigest_fit(ev, "value", delta=100)
    vals = np.sort(
        np.array(
            [r[0] for r in ev.select("value").filter(F.col("value").isNotNull()).collect()]
        )
    )
    return m, w, vals


def test_total_weight_and_centroid_bound(fitted):
    m, w, vals = fitted
    assert w.sum() == pytest.approx(len(vals))
    # k1 scale: centroid count stays O(delta) — the greedy single-sweep
    # variant lands above the theoretical 2*delta but still constant-size
    assert len(m) <= 4 * 100
    assert np.all(np.diff(m) >= 0)


def test_rank_error_within_digest_bound(fitted):
    m, w, vals = fitted
    n = len(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = SK.tdigest_quantile(m, w, q)
        # rank of the estimate in the exact sorted data
        rank_lo = np.searchsorted(vals, est, side="left") / n
        rank_hi = np.searchsorted(vals, est, side="right") / n
        err = min(abs(rank_lo - q), abs(rank_hi - q))
        # t-digest rank error concentrates at ~O(q(1-q)/delta); 0.02 is a
        # generous absolute ceiling for delta=100
        assert err <= 0.02, (q, est, rank_lo, rank_hi)


def test_merge_deterministic_under_repartition(spark, sf_dir, fitted):
    m, w, _ = fitted
    ev = load_table(spark, sf_dir, "events")
    m2, w2 = SK.tdigest_fit(ev.repartition(7, "event_id"), "value", delta=100)
    # different partitioning => different partials, but quantile estimates
    # must agree to digest accuracy (and the fit itself must be stable
    # run-to-run for a FIXED layout: re-fit and compare exactly)
    m3, w3 = SK.tdigest_fit(ev, "value", delta=100)
    assert np.array_equal(m, m3) and np.array_equal(w, w3)
    for q in (0.25, 0.5, 0.9):
        a = SK.tdigest_quantile(m, w, q)
        b = SK.tdigest_quantile(m2, w2, q)
        assert abs(a - b) <= 0.05 * (1 + abs(a)), (q, a, b)


def test_streaming_digest_matches_batch(spark, sf_dir, tmp_path, fitted):
    """Incremental sketch maintenance: a file-source stream of the events
    table, folded one micro-batch at a time into a running digest via
    foreachBatch, must estimate the same quantiles as the one-shot batch
    fit (within digest accuracy). This is the pre-aggregated-quantile
    pattern at 100 TB: per-epoch work is one partial digest, history is
    never re-scanned."""
    import shutil

    from gpu_telemetry_lakehouse_spark.catalog import load_table

    m_b, w_b, _ = fitted
    src = str(tmp_path / "src")
    ev = load_table(spark, sf_dir, "events")
    # lay the table out as several files so the stream sees multiple batches
    ev.repartition(4).write.parquet(src)
    state: list = []

    def fold(bdf, epoch_id):
        state.append(SK.tdigest_fit(bdf, "value", delta=100))

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(state) >= 2  # genuinely incremental
    m_s, w_s = SK.tdigest_merge(state, delta=100)
    assert w_s.sum() == pytest.approx(w_b.sum())
    for qq in (0.1, 0.5, 0.9):
        a = SK.tdigest_quantile(m_b, w_b, qq)
        b = SK.tdigest_quantile(m_s, w_s, qq)
        assert abs(a - b) <= 0.05 * (1 + abs(a)), (qq, a, b)
    shutil.rmtree(src, ignore_errors=True)


def test_grouped_digest_tracks_exact_percentiles(spark, sf_dir):
    """Per-day digest p50/p95 must sit within digest RANK accuracy of the
    exact distribution, every day — t-digest bounds rank error, not value
    error (a heavy-tailed value axis can stretch small rank errors into
    large value gaps, so asserting value closeness would be wrong)."""
    from pyspark.sql import functions as F

    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from gpu_telemetry_lakehouse_spark.operators.sketch import (
        tdigest_group_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(F.date_trunc("day", "ts").alias("day"), "value")
    est = {
        r["day"]: (r["q0_5"], r["q0_95"])
        for r in tdigest_group_quantiles(daily, ["day"], "value", [0.5, 0.95]).collect()
    }
    import numpy as np

    vals = {}
    for r in daily.collect():
        vals.setdefault(r["day"], []).append(r["value"])
    assert set(est) == set(vals)
    for day, (e50, e95) in est.items():
        v = np.sort(np.array(vals[day], dtype=float))
        for q, e in ((0.5, e50), (0.95, e95)):
            lo = np.searchsorted(v, e, side="left") / len(v)
            hi = np.searchsorted(v, e, side="right") / len(v)
            # q inside the estimate's [lo, hi] rank interval (tie runs /
            # interpolation between neighbors) is a perfect estimate
            err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
            assert err <= 0.02, (day, q, e, lo, hi)


def test_grouped_digest_all_null_group(spark):
    """A group whose value column is entirely NULL yields NULL quantiles
    instead of crashing the applyInPandas task (review r3: _compress used
    to index means[0] on the empty array)."""
    from gpu_telemetry_lakehouse_spark.operators.sketch import (
        tdigest_group_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)],
        "g string, v double",
    )
    out = {
        r.g: r for r in tdigest_group_quantiles(df, ["g"], "v", [0.5]).collect()
    }
    assert out["b"].q0_5 is None
    assert out["a"].q0_5 == pytest.approx(2.0, abs=1.0)

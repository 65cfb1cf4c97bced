"""Invariant tests for the payload halves of the payload/certified query
twins (round 5, ADVICE r4 medium): the certified twins carry the DuckDB
oracles; these tests pin the payload queries' structural contracts so the
rows-only entries are never pytest-uncovered."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir).collect()


def test_knn_payloads_return_ranked_neighbors(spark, sf_dir):
    for name in ("knn_ivf", "knn_pq_adc", "knn_ivfpq"):
        rows = _rows(spark, sf_dir, name)
        assert rows, name
        per_q: dict = {}
        for r in rows:
            assert r["neighbor_id"] != r["query_id"], (name, r)
            per_q.setdefault(r["query_id"], []).append(r["rn"])
        for q, rns in per_q.items():
            assert sorted(rns) == list(range(1, len(rns) + 1)), (name, q, rns)
            assert len(rns) <= 5, (name, q)


def test_theta_overlap_payload_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "theta_user_overlap")
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"], r
        assert r["est_shared"] >= 0, r


def test_tdigest_payloads_monotone_and_finite(spark, sf_dir):
    grid = _rows(spark, sf_dir, "tdigest_value_quantiles")
    assert [r["q"] for r in grid] == [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    ests = [r["est"] for r in grid]
    assert all(math.isfinite(e) for e in ests), ests
    # quantile evaluation over ONE digest is monotone in q
    assert ests == sorted(ests), ests

    daily = _rows(spark, sf_dir, "tdigest_daily_value_p95")
    assert daily
    for r in daily:
        assert math.isfinite(r["p50_est"]) and math.isfinite(r["p95_est"]), r
        assert r["p50_est"] <= r["p95_est"], r


def test_als_payload_recommendation_contract(spark, sf_dir):
    df = QUERIES["als_recommend_parts"](spark, sf_dir)
    bad = (
        df.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.min(
                (F.col("rec_rank").between(1, 5)).cast("int")
            ).alias("rank_ok"),
        )
        .filter((F.col("k") != 5) | (F.col("rank_ok") == 0))
        .count()
    )
    assert bad == 0
    # scores non-increasing within each customer's list
    from pyspark.sql import Window as W

    w = W.partitionBy("custkey").orderBy("rec_rank")
    viol = (
        df.withColumn("prev", F.lag("score").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("score") > F.col("prev")))
        .count()
    )
    assert viol == 0


def test_anomaly_daily_payload_contract(spark, sf_dir):
    rows = _rows(spark, sf_dir, "anomaly_daily")
    assert rows
    flags = [r["anomaly_flag"] for r in rows]
    assert set(flags) <= {0, 1}
    n, nf = len(rows), sum(flags)
    # tie-robust contamination-quantile bound (see anomaly_daily_certified):
    # expected <= n_flagged <= expected - 1 + #scores tied at the boundary
    expected = math.floor(0.05 * (n - 1)) + 1
    min_f = min(r["anomaly_score"] for r in rows if r["anomaly_flag"] == 1)
    ties = sum(1 for r in rows if r["anomaly_score"] == min_f)
    assert expected <= nf <= expected - 1 + ties, (nf, expected, ties)
    # flags are a top set of the scores (>= — the stored scores are
    # 6dp-rounded while flags used raw scores; rounding is monotone so a
    # collision can equalize the boundary but never invert it)
    unflagged = [r["anomaly_score"] for r in rows if r["anomaly_flag"] == 0]
    assert not unflagged or min_f >= max(unflagged)
    assert all(math.isfinite(r["anomaly_score"]) for r in rows)

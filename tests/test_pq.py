"""Product-quantization invariants: fit determinism, code-table compression
shape, ADC+re-rank recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, PQ.pq_fit(emb, m=8, k=16)


def test_fit_deterministic(spark, sf_dir, fitted):
    emb, books = fitted
    again = PQ.pq_fit(emb, m=8, k=16)
    assert books == again
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)


def test_codes_shape_and_range(fitted):
    emb, books = fitted
    codes = PQ.pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_adc_rerank_recall_vs_brute(fitted):
    emb, books = fitted
    codes = PQ.pq_encode(emb, books)
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=float)
    ids = np.array([r["vec_id"] for r in rows])
    recalls = []
    for qid in (0, 1, 2):
        q = X[ids == qid][0]
        res = PQ.pq_adc_topk(codes, emb, books, q, qid, k=10, rerank=50).collect()
        got = {r["neighbor_id"] for r in res}
        dist = ((X - q) ** 2).sum(1)
        order = np.argsort(dist, kind="stable")
        truth = {int(ids[i]) for i in order if ids[i] != qid}
        truth = set(list(sorted(truth, key=lambda t: dist[ids == t][0]))[:10])
        recalls.append(len(got & truth) / 10)
        # exact_dist column really is the exact L2 for returned neighbors
        for r in res:
            assert r["exact_dist"] == pytest.approx(
                float(dist[ids == r["neighbor_id"]][0]), abs=1e-4
            )
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivfpq_prunes_and_recalls(spark, sf_dir, fitted):
    """IVF-PQ: the probe filter must scan strictly fewer codes than the full
    table, and recall@10 with n_probe=4/8 + re-rank must stay usable."""
    from gpu_telemetry_lakehouse_spark.operators.similarity import (
        kmeans_centroids,
    )

    emb, books = fitted
    cents = kmeans_centroids(emb, n_clusters=8)
    enc = PQ.ivfpq_encode(emb, cents, books)
    total = enc.count()
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype=float)
    ids = np.array([r["vec_id"] for r in rows])
    recalls = []
    for qid in (0, 1, 2):
        q = X[ids == qid][0]
        res = PQ.ivfpq_topk(enc, emb, cents, books, q, qid, n_probe=4, k=10,
                            rerank=50).collect()
        got = {r["neighbor_id"] for r in res}
        dist = ((X - q) ** 2).sum(1)
        order = np.argsort(dist, kind="stable")
        truth = [int(ids[i]) for i in order if ids[i] != qid][:10]
        recalls.append(len(got & set(truth)) / 10)
    # pruning: 4 of 8 clusters probed -> strictly less than the full table
    C = np.array(cents)
    q = X[ids == 0][0]
    sims = (C @ q) / (np.linalg.norm(C, axis=1) * np.linalg.norm(q) + 1e-12)
    probes = list(np.argsort(-sims, kind="stable")[:4])
    scanned = enc.filter(F.col("cluster").isin([int(p) for p in probes])).count()
    assert scanned < total
    assert sum(recalls) / len(recalls) >= 0.4, recalls

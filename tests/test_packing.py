"""Greedy sequence packing (operators/packing.py): budget, completeness,
determinism invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.operators.packing import pack_greedy

MAX = 4096


def _packed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return pack_greedy(docs, size_col="n_chars", max_units=MAX, order_col="doc_id")


def test_budget_respected(spark, sf_dir):
    packs = _packed(spark, sf_dir).groupBy("pack_id").agg(
        F.sum("n_chars").alias("total"), F.count(F.lit(1)).alias("n")
    )
    # multi-row packs stay within budget; only singleton packs may overflow
    bad = packs.filter((F.col("total") > MAX) & (F.col("n") > 1)).count()
    assert bad == 0


def test_rows_preserved_and_positions_contiguous(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = _packed(spark, sf_dir)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # pack_pos must be 0..n-1 within each pack
    stats = packed.groupBy("pack_id").agg(
        F.min("pack_pos").alias("lo"),
        F.max("pack_pos").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert stats.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0


def test_deterministic_assignment(spark, sf_dir):
    a = _packed(spark, sf_dir).select("doc_id", "pack_id", "pack_pos")
    b = _packed(spark, sf_dir).select("doc_id", "pack_id", "pack_pos")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_greedy_property_random_sizes(spark):
    """Property check over adversarial size distributions (zeros, oversize
    rows, max-boundary sizes): budget/completeness/determinism hold."""
    import random

    rnd = random.Random(7)
    rows = [
        (i, rnd.choice([0, 1, 5, MAX // 2, MAX - 1, MAX, MAX + 100, rnd.randint(1, MAX)]))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    packed = pack_greedy(df, size_col="n_chars", max_units=MAX, order_col="doc_id")
    out = packed.collect()
    assert len(out) == 500
    by_pack: dict = {}
    for r in out:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, members in by_pack.items():
        total = sum(m.n_chars for m in members)
        if len(members) > 1:
            assert total <= MAX, (pid, total)
        poss = sorted(m.pack_pos for m in members)
        assert poss == list(range(len(members)))

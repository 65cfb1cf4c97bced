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

"""Managed-table catalog round-trip: saveAsTable -> spark.table -> catalog
listing — the metastore-backed form of the warehouse tier (S4/S5/S6), next
to the path-based tablog form flow.py uses."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table


def test_save_as_table_round_trip(spark, sf_dir):
    gold = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("dt"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "gold_daily_events_t"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    gold.write.mode("overwrite").saveAsTable(name)
    try:
        back = spark.table(name)
        assert back.count() == gold.count()
        assert {r.dt for r in back.collect()} == {r.dt for r in gold.collect()}
        tables = [t.name for t in spark.catalog.listTables()]
        assert name in tables
        # SQL over the managed table works like any registered relation
        n = spark.sql(f"SELECT SUM(n) AS s FROM {name}").first().s
        assert n == load_table(spark, sf_dir, "events").count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert name not in [t.name for t in spark.catalog.listTables()]

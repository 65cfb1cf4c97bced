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


def test_sql_function_registration(spark, sf_dir):
    """Engine helpers as SQL-language UDFs: same results as the DataFrame
    helpers, fully inlined (no Python eval stage in the plan)."""
    from gpu_telemetry_lakehouse_spark.catalog import register_views
    from gpu_telemetry_lakehouse_spark.functions import (
        md5_int,
        register_sql_functions,
        tokens,
    )
    from gpu_telemetry_lakehouse_spark.plans import explain_formatted

    register_sql_functions(spark)
    register_views(spark, sf_dir, ["documents", "embeddings"])
    sql_df = spark.sql(
        """
        SELECT doc_id, md5_int60(text) AS h, size(ws_tokens(text)) AS n
        FROM documents ORDER BY doc_id LIMIT 20
        """
    )
    assert "EvalPython" not in explain_formatted(sql_df)
    got = {(r.doc_id, r.h, r.n) for r in sql_df.collect()}
    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r.doc_id, r.h, r.n)
        for r in docs.select(
            "doc_id",
            md5_int(F.col("text")).alias("h"),
            F.size(tokens(F.col("text"))).alias("n"),
        )
        .orderBy("doc_id")
        .limit(20)
        .collect()
    }
    assert got == want

    cos = spark.sql(
        """
        SELECT vec_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
                          CAST(b.embedding AS ARRAY<DOUBLE>)) AS c
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id = 0
        """
    ).first()
    assert cos is not None and -1.0 <= cos.c <= 1.0


def test_parameterized_sql_and_identifier(spark, sf_dir):
    """Spark 4 parameterized SQL: named parameter binding (values never
    concatenated into SQL text — the injection-proof path for dynamic
    filters) and IDENTIFIER() for safe dynamic relation names."""
    from gpu_telemetry_lakehouse_spark.catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > :cut",
        args={"cut": 300000.0},
    ).first().n
    want = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .count()
    )
    assert got == want > 0

    # IDENTIFIER(): dynamic table name without string-splicing SQL
    got2 = spark.sql(
        "SELECT COUNT(*) AS n FROM IDENTIFIER(:tbl)", args={"tbl": "orders"}
    ).first().n
    assert got2 == load_table(spark, sf_dir, "orders").count()

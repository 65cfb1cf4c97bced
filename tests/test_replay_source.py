"""Custom Python DataSource (telemetry_replay): batch/stream parity,
partitioned generation, deterministic regeneration (retry-safety)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.streaming.replay_source import (
    register,
    row_for,
)

MACHINES, TICKS = 6, 20


def _load(spark):
    register(spark)
    return (
        spark.read.format("telemetry_replay")
        .option("machines", MACHINES)
        .option("ticks", TICKS)
        .option("numPartitions", 3)
        .load()
    )


def test_batch_matches_generator_and_partitions(spark):
    df = _load(spark)
    assert df.rdd.getNumPartitions() == 3
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(row_for(m, t) for m in range(MACHINES) for t in range(TICKS))
    assert got == want


def test_batch_is_deterministic_across_reads(spark):
    a = sorted(tuple(r) for r in _load(spark).collect())
    b = sorted(tuple(r) for r in _load(spark).collect())
    assert a == b


def test_stream_equals_batch(spark):
    register(spark)
    stream = (
        spark.readStream.format("telemetry_replay")
        .option("machines", MACHINES)
        .option("ticks", TICKS)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_replay")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.table("t_replay").collect())
    finally:
        q.stop()
    want = sorted(tuple(r) for r in _load(spark).collect())
    assert got == want


def test_stream_aggregates_like_engine_gold(spark):
    """The connector feeds the same incremental gold rollup as file replay:
    per-machine averages over the simulated hour match the batch compute."""
    register(spark)
    stream = (
        spark.readStream.format("telemetry_replay")
        .option("machines", MACHINES)
        .option("ticks", TICKS)
        .load()
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("machine_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("gpu_util").alias("s"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_replay_gold")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.machine_id: (r.n, round(r.s, 6))
            for r in spark.table("t_replay_gold").collect()
        }
    finally:
        q.stop()
    want = {
        r.machine_id: (r.n, round(r.s, 6))
        for r in _load(spark)
        .groupBy("machine_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("gpu_util").alias("s"))
        .collect()
    }
    assert got == want


# --- tablog change-feed streaming source --------------------------------------


def test_tablog_stream_source_follows_commits(spark, sf_dir, tmp_path):
    from gpu_telemetry_lakehouse_spark import tablog as T
    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from gpu_telemetry_lakehouse_spark.streaming.tablog_source import (
        register as register_tablog,
    )

    tbl = str(tmp_path / "feed")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    T.create_table(o.limit(10), tbl)
    register_tablog(spark)
    q = (
        spark.readStream.format("tablog")
        .option("path", tbl)
        .load()
        .writeStream.format("memory")
        .queryName("tablog_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM tablog_feed").first()["c"] == 10
        # a NEW commit lands while the stream runs: the next batch picks up
        # exactly the added files
        T.append(o.limit(25).exceptAll(o.limit(10)), tbl)
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM tablog_feed").first()["c"] == 25
        # column content round-trips (not just counts)
        got = spark.sql("SELECT SUM(o_orderkey) s FROM tablog_feed").first()["s"]
        want = T.read(spark, tbl).agg(F.sum("o_orderkey")).first()[0]
        assert got == want
    finally:
        q.stop()


def test_tablog_stream_source_start_version_and_restart(spark, sf_dir, tmp_path):
    from gpu_telemetry_lakehouse_spark import tablog as T
    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from gpu_telemetry_lakehouse_spark.streaming.tablog_source import (
        register as register_tablog,
    )

    tbl = str(tmp_path / "feed2")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    T.create_table(o.limit(10), tbl)  # v0: history to skip
    v = T.current_version(tbl)
    T.append(o.limit(15).exceptAll(o.limit(10)), tbl)  # v1: streamed
    register_tablog(spark)

    out = str(tmp_path / "out")

    def start():
        # file sink (memory sink cannot recover from a checkpoint)
        return (
            spark.readStream.format("tablog")
            .option("path", tbl)
            .option("start_version", str(v))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # only post-start_version rows: 5, not 15
    assert spark.read.parquet(out).count() == 5
    # restart from the checkpoint: already-consumed versions do NOT replay
    T.append(o.limit(18).exceptAll(o.limit(15)), tbl)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 5 + 3


def test_tablog_multi_hop_streaming_pipeline(spark, sf_dir, tmp_path):
    """bronze table --change feed--> transform --exactly-once--> silver
    table: both hops are tablog tables, the stream is restart-safe on both
    ends (version offsets in, batch-id ledger out), and the silver content
    equals the batch-computed transform of bronze."""
    from gpu_telemetry_lakehouse_spark import tablog as T
    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from gpu_telemetry_lakehouse_spark.streaming.tablog_source import (
        register as register_tablog,
    )

    bronze, silver = str(tmp_path / "bronze"), str(tmp_path / "silver")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    T.create_table(o.limit(20), bronze)
    register_tablog(spark)
    q = (
        spark.readStream.format("tablog")
        .option("path", bronze)
        .load()
        .withColumn("price_band", (F.col("o_totalprice") / 50000).cast("int"))
        .writeStream.foreachBatch(T.stream_writer(silver))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        T.append(o.limit(35).exceptAll(o.limit(20)), bronze)  # late bronze data
        q.processAllAvailable()
    finally:
        q.stop()
    got = T.read(spark, silver)
    want = T.read(spark, bronze).withColumn(
        "price_band", (F.col("o_totalprice") / 50000).cast("int")
    )
    assert got.count() == 35
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

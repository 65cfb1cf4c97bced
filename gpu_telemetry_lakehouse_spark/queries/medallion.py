"""Medallion end-to-end probe: fixture CSVs -> full pipeline -> gold read.

One driver-checkable query that exercises the pipeline-shaped SURVEY.md §2.1
rows that are not themselves query-shaped: S1 CSV scan, S2 parquet sink,
S5/S6 table materialization, Q2 ref()-DAG topological build, X1 orchestrated
flow, X2 row-count observability, plus the seven dbt-style checks (A4/A5)
which run inside ``full_refresh`` (reference: pipelines/flow_full_refresh.py:
79-90 runs ingest -> dbt run -> dbt test -> ML train -> ML score).

Mechanics: deterministic fixture CSVs are derived in Spark from the driver's
``events``/``orders``/... parquet tables, written to a scratch dir, ingested
through the real CSV->bronze->silver->gold pipeline (tablog-versioned
warehouse, checks, IsolationForest scoring), and the result is the built
``gold_cluster_util_daily`` table cross-joined with a one-row summary of the
built ``silver_jobs`` table. The DuckDB oracle replays the same element-wise
arithmetic directly over ``events``/``orders`` — valid because every hop in
between (CSV round-trip via shortest-repr doubles, parquet round-trip,
rename/filter models) is value-preserving by construction.
"""

from __future__ import annotations

import os
import shutil
from hashlib import md5
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import exact_sum
from .registry import query

_REPO_ROOT = Path(__file__).resolve().parents[2]


def _fixture_csvs(spark: SparkSession, sf_dir: str, src_dir: str) -> None:
    """Derive the five reference source CSVs from the driver testdata.

    All columns are doubles/longs/strings (no timestamps), so the Spark CSV
    round-trip is bit-exact: Java's shortest-round-trip double formatting
    parses back to the identical IEEE value, NULL writes as empty and reads
    back as NULL under the declared schema.
    """
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts").cast("double")  # floor(epoch) as double
    etype = F.coalesce(F.col("event_type"), F.lit("unknown"))
    metrics = ev.select(
        F.concat(F.lit("w"), F.col("event_id").cast("string")).alias("worker_name"),
        etype.alias("machine"),
        (epoch_s - 60.0).alias("start_time"),
        # 'error' samples get a NULL window end -> dropped by the silver
        # IS NOT NULL filter (reference: silver_gpu_timeseries.sql:37)
        F.when(etype != "error", epoch_s).alias("end_time"),
        F.col("value").alias("machine_gpu"),
        (F.col("value") * 0.5).alias("machine_cpu"),
        (F.col("value") * 0.1).alias("machine_cpu_iowait"),
        (F.col("value") * 0.2).alias("machine_cpu_kernel"),
        (F.col("value") * 0.3).alias("machine_cpu_usr"),
        (F.col("value") * 0.01).alias("machine_load_1"),
        (F.col("value") * 10.0).alias("machine_net_receive"),
        (F.col("event_id") % 4).cast("long").alias("machine_num_worker"),
    )

    o = load_table(spark, sf_dir, "orders")
    # Job times are mapped INTO the metrics window (2024-01, epoch 1704067200)
    # rather than taken from o_orderdate (1995-2001): still-Running jobs are
    # capped at the telemetry horizon by gold_job_efficiency_daily, and a
    # 29-year start->horizon span would day-explode into millions of rows.
    start = (F.lit(1704067200) + (F.col("o_orderkey") % 2500000)).cast("double")
    jobs = o.select(
        F.concat(F.lit("job_"), F.col("o_orderkey").cast("string")).alias("job_name"),
        F.concat(F.lit("inst_"), F.col("o_orderkey").cast("string")).alias("inst_id"),
        F.concat(F.lit("u"), (F.col("o_custkey") % 97).cast("string")).alias("user"),
        F.when(F.col("o_orderstatus") == "O", "Running")
        .when(F.col("o_orderstatus") == "F", "Terminated")
        .otherwise("Failed")
        .alias("status"),
        start.alias("start_time"),
        # Running jobs have NULL end_time (silver_jobs.sql:25-28 null guard)
        F.when(F.col("o_orderstatus") != "O", start + F.col("o_totalprice")).alias(
            "end_time"
        ),
    )
    instances = jobs.select(
        "inst_id", "job_name", "status", "start_time", "end_time"
    )

    s = load_table(spark, sf_dir, "supplier")
    machine_spec = s.select(
        F.col("s_name").alias("machine"),
        F.col("s_suppkey").alias("cap_cpu"),
        (F.col("s_suppkey") * 4).alias("cap_mem"),
        (F.col("s_suppkey") % 8).alias("cap_gpu"),
    )

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    gpu_specs = p.select(
        F.col("p_name").alias("Product_Name"),
        F.col("p_brand").alias("GPU_Chip"),
        F.concat(F.lit("Sep "), (F.lit(1990) + F.col("p_size") % 30)).alias("Released"),
        F.lit("PCIe 4.0 x16").alias("Bus"),
        F.concat(
            F.col("p_size").cast("string"),
            F.lit(" GB, "),
            F.col("p_type"),
            F.lit(", "),
            (F.col("p_size") * 8).cast("string"),
            F.lit(" bit"),
        ).alias("Memory"),
        F.concat((F.lit(1000) + F.col("p_size")).cast("string"), F.lit(" MHz")).alias(
            "GPU_clock"
        ),
        F.concat((F.lit(900) + F.col("p_size")).cast("string"), F.lit(" MHz")).alias(
            "Memory_clock"
        ),
        F.concat_ws(
            " / ",
            (F.col("p_size") * 64).cast("string"),
            (F.col("p_size") * 4).cast("string"),
            F.col("p_size").cast("string"),
        ).alias("Shaders_TMUs_ROPs"),
    )

    from ..catalog import spread_input

    for fname, df in [
        # spread the two fact-derived frames: the local one-row-group source
        # otherwise serializes the whole CSV (number formatting is the cost)
        # through ONE write task (r9 profile; no-op at cluster split counts).
        # Multiple part files change only row order, and every consumer of
        # these fixtures is order-insensitive (aggregates/joins; the one
        # row_number in the pipeline orders by a full deterministic key).
        ("pai_machine_metric.csv", spread_input(metrics)),
        ("pai_job_table.csv", spread_input(jobs)),
        ("pai_instance_table.csv", spread_input(instances)),
        ("pai_machine_spec.csv", machine_spec),
        ("tpu_gpus.csv", gpu_specs),
    ]:
        df.write.mode("overwrite").option("header", True).csv(
            os.path.join(src_dir, fname)
        )


@query(
    "medallion_end_to_end",
    oracle="""
    WITH g AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
               ROUND((SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                     / COUNT(value), 6) AS avg_gpu_util,
               ROUND(quantile_cont(value, 0.95), 6) AS p95_gpu_util,
               ROUND((SUM(CAST(FLOOR((value * 0.5) * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                     / COUNT(value), 6) AS avg_cpu_util
        FROM events
        WHERE COALESCE(event_type, 'unknown') <> 'error' AND value IS NOT NULL
        GROUP BY 1
    ), j AS (
        SELECT COUNT(*) AS n_jobs,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_running,
               SUM(CAST(FLOOR(
                   ((CAST(1704067200 + (o_orderkey % 2500000) AS DOUBLE) + o_totalprice)
                    - CAST(1704067200 + (o_orderkey % 2500000) AS DOUBLE))
                   * CASE WHEN o_orderstatus <> 'O' THEN 10000 END + 0.5) AS BIGINT)
               ) / 10000.0 AS runtime_sec_total
        FROM orders
    )
    SELECT g.dt, g.avg_gpu_util, g.p95_gpu_util, g.avg_cpu_util,
           j.n_jobs, j.n_running, j.runtime_sec_total
    FROM g CROSS JOIN j
    """,
)
def medallion_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the whole medallion pipeline on events/orders-derived fixtures and
    return the built gold table + a silver_jobs summary (reference:
    flow_full_refresh.py:79-90 end to end)."""
    from ..flow import full_refresh

    scratch = str(
        _REPO_ROOT / ".scratch" / "medallion" / md5(sf_dir.encode()).hexdigest()[:10]
    )
    shutil.rmtree(scratch, ignore_errors=True)
    src_dir = os.path.join(scratch, "sources")
    lake_dir = os.path.join(scratch, "lake")
    _fixture_csvs(spark, sf_dir, src_dir)

    built = full_refresh(spark, src_dir, lake_dir)

    gold = built["gold_cluster_util_daily"].select(
        "dt",
        F.round("avg_gpu_util", 6).alias("avg_gpu_util"),
        F.round("p95_gpu_util", 6).alias("p95_gpu_util"),
        F.round("avg_cpu_util", 6).alias("avg_cpu_util"),
    )
    jobs_summary = built["silver_jobs"].agg(
        F.count(F.lit(1)).alias("n_jobs"),
        F.count(F.when(F.col("job_status") == "Running", 1)).alias("n_running"),
        exact_sum("run_time_sec").alias("runtime_sec_total"),
    )
    return gold.crossJoin(F.broadcast(jobs_summary))

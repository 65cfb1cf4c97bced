"""Full-refresh pipeline: ingest -> models -> checks -> ML scoring.

reference: pipelines/flow_full_refresh.py:79-90 — a Prefect flow of
subprocess hops (ingest, dbt run, dbt test, ML train, ML score). Spark-first:
one driver, function calls, DataFrames end to end; the only process
boundaries left are Spark shuffles.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

from . import models as M
from . import tablog as T
from .checks import run_reference_checks
from .ingest import ingest_all
from .ml.anomaly import DEFAULT_FEATURES, score_driver_side

log = logging.getLogger(__name__)

# Footer-stats columns per warehouse table — what tablog's file skipping
# prunes on (the dominant predicate column of each tier's consumers).
STAT_COLS: dict[str, list[str]] = {
    "silver_jobs": ["job_id"],
    "silver_gpu_timeseries": ["ts", "machine_id"],
    "gold_cluster_util_daily": ["dt"],
    "gold_cluster_util_daily_scored": ["dt"],
    "gold_job_efficiency_daily": ["dt"],
    "gold_user_gpu_usage_daily": ["dt"],
}


def _materialize(spark: SparkSession, df: DataFrame, path: str, name: str) -> DataFrame:
    """Persist a warehouse table through the versioned table format: first
    build is version 0, every refresh commits a new snapshot — the warehouse
    keeps its full history (time travel to any prior refresh) and readers
    never observe a half-written table (the reference's DuckDB CTAS gave the
    same atomicity single-node; tablog gives it on a distributed lake)."""
    stat_cols = STAT_COLS.get(name, [])
    if os.path.isdir(os.path.join(path, T.LOG_DIR)):
        T.overwrite(df, path, stat_cols=stat_cols)
    else:
        T.create_table(df, path, stat_cols=stat_cols)
    return T.read(spark, path)


def full_refresh(spark: SparkSession, source_dir: str, lake_dir: str) -> dict[str, DataFrame]:
    """Run the whole medallion pipeline; returns every built frame.

    Persisted tiers mirror the reference's materializations: bronze parquet
    (ingest), silver/gold as versioned tablog tables (our improvement — the
    reference overwrites single files with no history, SURVEY.md §1.4).
    """
    bronze = ingest_all(spark, source_dir, lake_dir)
    # Build and materialize INTERLEAVED in dependency order: build_all wires
    # every model to its deps' lazy lineages, so materializing afterwards
    # (the pre-r9 shape) left each GOLD table's write recomputing its silver
    # deps from the bronze CSVs — a full CSV re-parse per gold mart (r9
    # profile: gold_job_efficiency materialize 5-8s, gold_user 4-7s at
    # sf0.1). Replacing each table-model with its tablog read-back BEFORE
    # dependents build makes every tier consume the WRITTEN tier below —
    # checkpoint-per-stage, the module-docstring 100 TB contract. Values are
    # identical: the parquet round-trip is value-preserving and downstream
    # arithmetic is unchanged.
    built: dict[str, DataFrame] = dict(bronze)
    for name in M.topo_order(None):
        m = M.MODELS[name]
        df = m.build(**{d: built[d] for d in m.deps})
        if m.materialized == "table":
            path = os.path.join(lake_dir, "warehouse", name)
            df = _materialize(spark, df, path, name)
        built[name] = df

    run_reference_checks(built)  # dbt test equivalent

    if "gold_cluster_util_daily" in built:
        scored = score_driver_side(spark, built["gold_cluster_util_daily"], DEFAULT_FEATURES)
        name = "gold_cluster_util_daily_scored"
        path = os.path.join(lake_dir, "warehouse", name)
        built[name] = _materialize(spark, scored, path, name)

    return built


def incremental_update(
    spark: SparkSession, lake_dir: str, new_machine_metrics: DataFrame
) -> dict[str, DataFrame]:
    """Late-arriving telemetry without a full rebuild — the only refresh
    shape that survives 100 TB (the reference is full-refresh-only; dbt
    calls this an incremental model).

    Scale contract per tier:
    - **silver** (the big table) is APPEND-ONLY: the new rows land as one
      tablog append commit — no rewrite of history, ever.
    - the recompute reads back only the touched days: tablog's footer-stats
      ``between`` probe skips every silver file whose ts range misses them,
      so the scan is O(new days), not O(history).
    - **gold** (one row per day) gets exactly the affected day-rows
      recomputed and MERGEd atomically on ``dt`` — identical values to a
      from-scratch rebuild because daily aggregation is partitioned by day:
      a day's row depends only on that day's samples.
    - the scored table is re-derived from the full gold (IsolationForest
      trains on all days by design — bounded: one row per day).

    Equality with ``full_refresh`` over the union of inputs is pinned in
    tests/test_medallion.py::test_incremental_update_matches_full_rebuild.
    """
    silver_path = os.path.join(lake_dir, "warehouse", "silver_gpu_timeseries")
    gold_path = os.path.join(lake_dir, "warehouse", "gold_cluster_util_daily")

    from pyspark.sql import functions as F

    silver_new = M.MODELS["silver_gpu_timeseries"].build(new_machine_metrics)
    T.append(silver_new, silver_path, stat_cols=STAT_COLS["silver_gpu_timeseries"])

    # Touched days as EPOCH SECONDS, truncated JVM-side where the session tz
    # is pinned UTC. (Collecting TimestampType yields naive datetimes in the
    # Python driver's LOCAL tz — converting those back with timegm would
    # shift the window on any non-UTC driver and silently drop edge-of-day
    # samples from the recompute.) Driver-sized: one long per distinct day.
    day_s = F.unix_timestamp(F.date_trunc("day", F.timestamp_seconds("ts")))
    days_epoch = sorted(
        r.d for r in silver_new.select(day_s.alias("d")).distinct().collect()
    )
    if not days_epoch:
        return {}
    lo_s, hi_s = days_epoch[0], days_epoch[-1] + 86400
    log.info("incremental_update: %d day(s) affected", len(days_epoch))

    # Stats-pruned slice of silver (+ exact day membership on top: the
    # between probe is a file-skipping superset, not the predicate).
    sl = T.read(spark, silver_path, between=("ts", lo_s, hi_s)).filter(
        day_s.isin(days_epoch)
    )
    gold_rows = (
        M.MODELS["gold_cluster_util_daily"]
        .build(sl)
        .filter(F.unix_timestamp("dt").isin(days_epoch))
    )
    # stat-pruned MERGE: only gold files whose dt range can contain the
    # touched days are rewritten — O(affected days), not O(history)
    T.merge_upsert_pruned(
        spark, gold_rows, gold_path, key_cols=["dt"], stat_cols=STAT_COLS["gold_cluster_util_daily"]
    )

    gold = T.read(spark, gold_path)
    scored = score_driver_side(spark, gold, DEFAULT_FEATURES)
    scored_name = "gold_cluster_util_daily_scored"
    scored_path = os.path.join(lake_dir, "warehouse", scored_name)
    built = {
        "silver_gpu_timeseries": T.read(spark, silver_path),
        "gold_cluster_util_daily": gold,
        scored_name: _materialize(spark, scored, scored_path, scored_name),
    }
    return built

"""Golden-pipeline test: fixture CSVs (FIXTURES.md) through the full
medallion flow; asserts silver/gold values and the reference's 7 constraints."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from gpu_telemetry_lakehouse_spark.flow import full_refresh

DAY = 86400.0


def _machine_metric_rows(
    days: int, start_day: int = 0, ks: range = range(4)
) -> list[dict]:
    rows = []
    for day in range(start_day, days):
        for m in ("m1", "m2"):
            for k in ks:
                ts = day * DAY + k * 3600.0
                rows.append(
                    {
                        "worker_name": f"w_{m}",
                        "machine": m,
                        "start_time": ts - 60,
                        "end_time": None if (day == 0 and m == "m1" and k == 0) else ts,
                        "machine_gpu": None if k == 3 else 100.0 * day + 10.0 * k,
                        "machine_cpu": 50.0 + k,
                        "machine_cpu_iowait": 1.0,
                        "machine_cpu_kernel": 2.0,
                        "machine_cpu_usr": 3.0,
                        "machine_load_1": 4.0,
                        "machine_net_receive": 5.0,
                        "machine_num_worker": 2,
                    }
                )
    return rows


def write_sources(d, metric_days: int = 3, metric_rows: list[dict] | None = None) -> str:
    pd.DataFrame(
        {
            "job_name": [f"job_{i}" for i in range(6)],
            "inst_id": [f"inst_{i}" for i in range(6)],
            "user": ["u1", "u1", "u2", "u2", "u3", "u3"],
            "status": ["Terminated"] * 4 + ["Running", "Failed"],
            "start_time": [0.0, 100.0, 200.0, 300.0, 400.0, 500.0],
            # Running job -> NULL end_time (drives the CASE null-guard)
            "end_time": [1000.0, 1100.0, 1200.0, 1300.0, None, 1500.0],
        }
    ).to_csv(d / "pai_job_table.csv", index=False)

    pd.DataFrame(
        metric_rows if metric_rows is not None else _machine_metric_rows(metric_days)
    ).to_csv(d / "pai_machine_metric.csv", index=False)

    pd.DataFrame(
        {
            "inst_id": ["inst_0", "inst_1"],
            "job_name": ["job_0", "job_1"],
            "status": ["Terminated", "Terminated"],
            "start_time": [0.0, 100.0],
            "end_time": [1000.0, 1100.0],
        }
    ).to_csv(d / "pai_instance_table.csv", index=False)

    pd.DataFrame(
        {"machine": ["m1", "m2"], "cap_cpu": [96, 96], "cap_mem": [512, 512], "cap_gpu": [8, 8]}
    ).to_csv(d / "pai_machine_spec.csv", index=False)

    pd.DataFrame(
        {
            "Product_Name": ["GeForce RTX 3090", "Radeon RX 6900 XT"],
            "GPU_Chip": ["GA102", "Navi 21"],
            "Released": ["Sep 2020", "Dec 2020"],
            "Bus": ["PCIe 4.0 x16", "PCIe 4.0 x16"],
            "Memory": ["24 GB, GDDR6X, 384 bit", "16 GB, GDDR6, 256 bit"],
            "GPU_clock": ["1395 MHz", "1825 MHz"],
            "Memory_clock": ["1219 MHz", "2000 MHz"],
            "Shaders_TMUs_ROPs": ["10496 / 328 / 112", "5120 / 320 / 128"],
        }
    ).to_csv(d / "tpu_gpus.csv", index=False)
    return str(d)


@pytest.fixture(scope="module")
def source_dir(tmp_path_factory):
    return write_sources(tmp_path_factory.mktemp("sources"))


@pytest.fixture(scope="module")
def built(spark, source_dir, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("lake"))
    return full_refresh(spark, source_dir, lake)


def test_silver_jobs_values(built):
    rows = {r.job_id: r for r in built["silver_jobs"].collect()}
    assert len(rows) == 6
    assert rows["job_0"].run_time_sec == 1000.0
    assert rows["job_4"].run_time_sec is None  # Running job: NULL end_time
    assert rows["job_4"].job_status == "Running"
    assert rows["job_0"].user_id == "u1"  # reserved-word column renamed


def test_silver_timeseries_filters_null_ts(built):
    ts = built["silver_gpu_timeseries"]
    assert ts.count() == 23  # 24 rows minus the one NULL end_time
    assert ts.filter(ts.ts.isNull()).count() == 0


def test_gold_daily_shape(built):
    gold = built["gold_cluster_util_daily"].orderBy("dt").collect()
    assert len(gold) == 3  # three distinct days
    # day 1: gpu values (k<3 only; k=3 is NULL) = 100,110,120 on both machines
    d1 = gold[1]
    assert math.isclose(d1.avg_gpu_util, 110.0)
    # sorted gpu vals [100,100,110,110,120,120]: idx 0.95*5=4.75 -> 120 exactly
    assert d1.p95_gpu_util == pytest.approx(120.0)
    # dt is UTC midnight
    assert d1.dt.hour == 0 and d1.dt.day == 2


def test_gpu_specs_parsing(built):
    specs = {r.product_name: r for r in built["silver_gpu_specs"].collect()}
    r3090 = specs["GeForce RTX 3090"]
    assert r3090.mem_gb == 24.0
    assert r3090.mem_type == "GDDR6X"
    assert r3090.mem_bus_bits == 384
    assert r3090.shaders == 10496 and r3090.tmus == 328 and r3090.rops == 112
    assert r3090.released_year == 2020
    assert r3090.gpu_clock_mhz == 1395


def test_scored_gold_invariants(built):
    scored = built["gold_cluster_util_daily_scored"].collect()
    assert len(scored) == 3
    flags = {r.anomaly_flag for r in scored}
    assert flags <= {0, 1}
    assert all(0.0 < r.anomaly_score <= 1.0 for r in scored)


def test_notebook_plot_script_runs(built, tmp_path, spark, source_dir):
    """V1 parity: the plot notebook's data path (scored gold -> dt-cast ->
    order -> pandas) runs end to end; without matplotlib it writes the
    plot-ready CSV."""
    import subprocess
    import sys as _sys
    from pathlib import Path

    lake = None
    # re-derive the lake dir used by the module-scoped `built` fixture
    scored = built["gold_cluster_util_daily_scored"]
    files = scored.inputFiles()
    assert files, "scored gold not materialized"
    lake = str(Path(files[0].replace("file:", "")).parent.parent.parent)

    out = tmp_path / "images"
    proc = subprocess.run(
        [_sys.executable, "notebooks/plot_daily_anomalies.py", lake, str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    produced = list(out.glob("daily_gpu_util_with_anomalies.*"))
    assert produced, proc.stdout


def test_refresh_history_is_versioned(spark, source_dir, tmp_path_factory):
    """Re-running the pipeline over the same lake commits new warehouse
    snapshots instead of clobbering: history grows, and time travel to the
    first refresh still reads the original gold rows."""
    from gpu_telemetry_lakehouse_spark import tablog as T

    lake = str(tmp_path_factory.mktemp("lake_versioned"))
    full_refresh(spark, source_dir, lake)
    full_refresh(spark, source_dir, lake)
    gold_path = os.path.join(lake, "warehouse", "gold_cluster_util_daily")
    hist = T.history(gold_path)
    assert [h["operation"] for h in hist] == ["create", "overwrite"]
    assert T.read(spark, gold_path, version=0).count() == 3
    assert T.read(spark, gold_path).count() == 3


def test_gold_job_efficiency_daily_math(built):
    """Allocated-vs-used GPU-hours (reference README.md:546-549): allocated =
    interval∩day hours per instance; used = allocated × that day's mean
    cluster utilization; the running job (NULL end) is capped at the
    observation horizon (max metric ts = day2 + 3h)."""
    rows = {(r.job_id, r.dt.day): r for r in built["gold_job_efficiency_daily"].collect()}
    # 5 finished jobs live on day 1 only; job_4 spans days 1-3 -> 8 rows
    assert len(rows) == 8
    j0 = rows[("job_0", 1)]
    assert math.isclose(j0.alloc_gpu_hours, 1000 / 3600)
    # day-0 cluster mean util: m1 k1,k2 + m2 k0..k2 = (10+20+0+10+20)/5 = 12
    assert math.isclose(j0.cluster_util_pct, 12.0)
    assert math.isclose(j0.used_gpu_hours, (1000 / 3600) * 12.0 / 100.0)
    assert math.isclose(j0.efficiency_pct, 12.0)
    # running job_4: full day 2 allocated; day-1 raw utils (100,110,120) are
    # clamped per-sample at 100 so mean util = 100 and used never exceeds
    # allocated (the PAI field's "dataset units" can exceed 100)
    j4d2 = rows[("job_4", 2)]
    assert math.isclose(j4d2.alloc_gpu_hours, 24.0)
    assert math.isclose(j4d2.used_gpu_hours, 24.0)
    assert all(r.used_gpu_hours <= r.alloc_gpu_hours + 1e-9 for r in rows.values())
    # horizon cap: day 3 holds only 3h (max ts = 2*86400 + 3*3600)
    j4d3 = rows[("job_4", 3)]
    assert math.isclose(j4d3.alloc_gpu_hours, 3.0)
    # day-0 partial: 86400 - 400 seconds
    assert math.isclose(rows[("job_4", 1)].alloc_gpu_hours, (86400 - 400) / 3600)


def test_gold_user_gpu_usage_daily_math(built):
    """Per-user GPU-hours / job counts / failure rates
    (reference README.md:550-553)."""
    rows = {(r.user_id, r.dt.day): r for r in built["gold_user_gpu_usage_daily"].collect()}
    u1 = rows[("u1", 1)]
    assert u1.n_jobs_active == 2 and u1.n_jobs_started == 2
    assert math.isclose(u1.gpu_hours, 2000 / 3600)
    assert u1.n_jobs_failed == 0 and u1.failure_rate == 0.0
    # u3: job_4 Running (NULL end -> 0 extra hours, still active/started),
    # job_5 Failed -> failure rate 1/2
    u3 = rows[("u3", 1)]
    assert u3.n_jobs_active == 2 and u3.n_jobs_started == 2
    assert u3.n_jobs_failed == 1
    assert math.isclose(u3.failure_rate, 0.5)
    assert math.isclose(u3.gpu_hours, 1000 / 3600)


def test_new_gold_marts_materialized_through_tablog(built, spark):
    """Both marts are persisted warehouse tables (version-0 tablog commits
    with dt stats), not lazy views."""
    import os

    from gpu_telemetry_lakehouse_spark import tablog as T

    for df in (built["gold_job_efficiency_daily"], built["gold_user_gpu_usage_daily"]):
        files = [f for f in df.inputFiles() if "warehouse" in f]
        assert files, "mart should be read back from its warehouse table"
        tbl = os.path.dirname(files[0].replace("file://", ""))
        assert T.history(tbl)[0]["operation"] == "create"
        stats = T.snapshot_files(tbl)[0]["stats"]
        assert "dt" in stats  # temporal stats present (MICROS encoding)


def test_incremental_update_matches_full_rebuild(spark, tmp_path_factory):
    """Late-arriving day of telemetry applied via incremental_update (silver
    append + stats-pruned day recompute + gold MERGE on dt) must produce
    gold and scored tables value-identical to a from-scratch full_refresh
    over the union of inputs, while silver history files stay untouched."""
    from gpu_telemetry_lakehouse_spark import tablog as T
    from gpu_telemetry_lakehouse_spark.flow import incremental_update
    from gpu_telemetry_lakehouse_spark.schemas import MACHINE_METRICS

    # Late batch covers BOTH incremental shapes: extra samples for an
    # ALREADY-BUILT day (day 1, new hours k=4,5 -> the gold MERGE must
    # combine pre-existing silver files with the appended ones) and a brand
    # new day (day 2 -> pure insert).
    base_rows = _machine_metric_rows(2)
    late_rows = _machine_metric_rows(2, start_day=1, ks=range(4, 6)) + _machine_metric_rows(
        3, start_day=2
    )
    inc_src = write_sources(tmp_path_factory.mktemp("inc_sources"), metric_rows=base_rows)
    inc_lake = str(tmp_path_factory.mktemp("inc_lake"))
    full_src = write_sources(
        tmp_path_factory.mktemp("full_sources"), metric_rows=base_rows + late_rows
    )
    full_lake = str(tmp_path_factory.mktemp("full_lake"))

    full_refresh(spark, inc_src, inc_lake)
    import os

    silver_path = os.path.join(inc_lake, "warehouse", "silver_gpu_timeseries")
    files_before = {a["file"] for a in T.snapshot_files(silver_path)}

    late = spark.createDataFrame(
        pd.DataFrame(late_rows), schema=MACHINE_METRICS
    )
    inc = incremental_update(spark, inc_lake, late)

    want = full_refresh(spark, full_src, full_lake)

    def rows(df, cols):
        return sorted(df.select(*cols).collect())

    gold_cols = ["dt", "avg_gpu_util", "p95_gpu_util", "avg_cpu_util"]
    assert rows(inc["gold_cluster_util_daily"], gold_cols) == rows(
        want["gold_cluster_util_daily"], gold_cols
    )
    scored_cols = gold_cols + ["anomaly_flag"]
    assert rows(inc["gold_cluster_util_daily_scored"], scored_cols) == rows(
        want["gold_cluster_util_daily_scored"], scored_cols
    )
    # silver history untouched: every pre-update file still in the snapshot
    files_after = {a["file"] for a in T.snapshot_files(silver_path)}
    assert files_before <= files_after and len(files_after) > len(files_before)

"""Time-series plot of daily utilization with anomaly overlay (V1 parity).

reference: notebooks/plot_daily_anomalies.py:15-45 — reads the scored gold
table, line-plots avg utilization over days, scatter-overlays the
anomaly_flag==1 days, saves a PNG. Deliberately a notebook, not an engine
operator (SURVEY.md §2.1 V1: "collect scored gold (small) -> matplotlib;
out of engine scope"): the scored gold tier is one row per day, so the
collect is bounded no matter the input scale.

matplotlib isn't part of the engine environment; without it the script
falls back to writing the plot-ready frame as CSV so the data path is
still exercised end to end.

Usage:
    python notebooks/plot_daily_anomalies.py [lake_dir] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path


def main() -> None:
    lake_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gtl_lake"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "docs/images")
    out_dir.mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from gpu_telemetry_lakehouse_spark.session import get_spark

    spark = get_spark(app="plot-daily-anomalies")
    scored = spark.read.parquet(
        str(Path(lake_dir) / "warehouse" / "gold_cluster_util_daily_scored")
    )
    # dt::timestamp cast + order by dt, as in the reference query (E4, O1)
    df = (
        scored.selectExpr(
            "cast(dt as timestamp) as dt", "avg_gpu_util", "anomaly_flag"
        )
        .orderBy("dt")
        .toPandas()
    )
    spark.stop()
    print(f"Loaded {len(df)} rows for plotting")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        out_csv = out_dir / "daily_gpu_util_with_anomalies.csv"
        df.to_csv(out_csv, index=False)
        print(f"matplotlib unavailable; wrote plot data to {out_csv}")
        return

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(df["dt"], df["avg_gpu_util"], marker="o", linestyle="-", label="avg_gpu_util")
    anomalies = df[df["anomaly_flag"] == 1]
    ax.scatter(anomalies["dt"], anomalies["avg_gpu_util"], marker="o", s=80, label="anomaly")
    ax.set_title("Daily Cluster GPU Utilization (with Anomalies)")
    ax.set_xlabel("Date")
    ax.set_ylabel("avg_gpu_util (dataset units)")
    ax.legend()
    fig.autofmt_xdate()
    out_path = out_dir / "daily_gpu_util_with_anomalies.png"
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    print(f"Saved plot to {out_path}")


if __name__ == "__main__":
    main()

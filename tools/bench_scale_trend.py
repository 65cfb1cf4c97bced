#!/usr/bin/env python
"""Measure the sf0.1 -> sf1 per-query Spark/DuckDB ratio trajectory.

VERDICT r7 #2: BASELINE.md's claim that the mid-size composites' ratios
"shrink with scale" (fixed Spark job overhead amortizing over more data)
was asserted from plan shape, never measured above sf0.1. This runs the
heavy slice — every BENCH_r07 serial entry >1s — at BOTH scale factors,
one query at a time (the apples-to-apples discipline bench.py documents),
best-of-2 per engine per sf, and prints per-query ratios plus the
trajectory. DuckDB runs the same oracle SQL over the same parquet in the
same process window, so host noise hits both engines alike.

Spark executes to a noop sink (no driver collect); DuckDB fetchall()s
(its results are small aggregates; materialization cost is negligible).

Usage: python tools/bench_scale_trend.py [--sf1-dir .scratch/sf1]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")  # sf1 wants more fan-out

from gpu_telemetry_lakehouse_spark.queries import ORACLE, QUERIES  # noqa: E402
from gpu_telemetry_lakehouse_spark.session import get_spark  # noqa: E402
from tests.oracle import duck_con  # noqa: E402

# Every BENCH_r07 serial entry >1s, heaviest first (LPT irrelevant — serial).
HEAVY_SLICE = [
    "kcore_peel_trace",            # 2.98s
    "dedup_shingle_jaccard",       # 2.25s
    "exact_substring_dup_spans",   # 1.89s
    "gold_job_efficiency_daily",   # 1.67s
    "sole_fault_suppliers",        # 1.63s
    "bigram_perplexity_docs",      # 1.34s
    "dsir_importance_weights",     # 1.29s
    "er_blocked_match_pairs",      # 1.25s
    "roc_auc_price_returns",       # 1.22s
    "bootstrap_ci_event_value",    # 1.11s
    "semdedup_prune",              # 1.10s
]


def spark_serial(spark, sf_dir: str, passes: int = 2) -> dict[str, float]:
    best: dict[str, float] = {}
    for _ in range(passes):
        for name in HEAVY_SLICE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            if name not in best or t < best[name]:
                best[name] = t
    return {k: round(v, 3) for k, v in best.items()}


def duck_serial(sf_dir: str, passes: int = 2) -> dict[str, float]:
    con = duck_con(sf_dir)
    best: dict[str, float] = {}
    for _ in range(passes):
        for name in HEAVY_SLICE:
            t0 = time.perf_counter()
            con.sql(ORACLE[name]).fetchall()
            t = time.perf_counter() - t0
            if name not in best or t < best[name]:
                best[name] = t
    con.close()
    return {k: round(v, 3) for k, v in best.items()}


def main() -> None:
    sf1_dir = os.path.join(ROOT, ".scratch", "sf1")
    if "--sf1-dir" in sys.argv:
        sf1_dir = sys.argv[sys.argv.index("--sf1-dir") + 1]
    if not os.path.isdir(sf1_dir):
        sys.exit(f"{sf1_dir} missing — run tools/scale_testdata.py first")
    sf01_dir = "/root/testdata/sf0.1"

    spark = get_spark(app="gtl-scale-trend")
    # warm both tiers off the clock (codegen + plan cache, bench.py recipe)
    for d in (sf01_dir, sf1_dir):
        for name in HEAVY_SLICE:
            QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for sf, d in (("sf0.1", sf01_dir), ("sf1", sf1_dir)):
        s = spark_serial(spark, d)
        k = duck_serial(d)
        out[sf] = {
            "spark": s,
            "duckdb": k,
            "spark_total": round(sum(s.values()), 3),
            "duckdb_total": round(sum(k.values()), 3),
        }
        print(f"== {sf}: spark {out[sf]['spark_total']}s  duckdb {out[sf]['duckdb_total']}s", flush=True)

    rows = []
    for name in HEAVY_SLICE:
        r01 = out["sf0.1"]["spark"][name] / max(out["sf0.1"]["duckdb"][name], 1e-9)
        r1 = out["sf1"]["spark"][name] / max(out["sf1"]["duckdb"][name], 1e-9)
        rows.append(
            {
                "query": name,
                "sf0.1_spark": out["sf0.1"]["spark"][name],
                "sf0.1_duck": out["sf0.1"]["duckdb"][name],
                "sf1_spark": out["sf1"]["spark"][name],
                "sf1_duck": out["sf1"]["duckdb"][name],
                "ratio_sf0.1": round(r01, 2),
                "ratio_sf1": round(r1, 2),
                "trend": "shrinks" if r1 < r01 else "grows",
            }
        )
    print(json.dumps({"slice": rows, "totals": {k: {kk: v[kk] for kk in ("spark_total", "duckdb_total")} for k, v in out.items()}}))


if __name__ == "__main__":
    main()

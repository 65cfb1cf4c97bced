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
         [--queries a,b,c] [--tiers sf1=.scratch/sf1,sf10=.scratch/sf10]
         [--passes N]

The r9 second-decade run (VERDICT r8 #2) uses --tiers to pit sf1 against
sf10 on the TARGETED slice whose absolute cost grew fastest in r8
(er_blocked_match_pairs, dedup_shingle_jaccard_capped,
gold_job_efficiency_daily, kcore_peel_trace); --passes 1 there — minutes-
scale runtimes make best-of-2 warmup discipline immaterial.
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
    "phrase_search_docs",          # 1.09s (joined the >1s tier in r9)
    "naive_bayes_lang_confusion",  # 1.09s (joined the >1s tier in r9)
]


def spark_serial(spark, sf_dir: str, passes: int = 2, slice_=None) -> dict[str, float]:
    best: dict[str, float] = {}
    for _ in range(passes):
        for name in (slice_ or HEAVY_SLICE):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            print(f"  spark {name}: {t:.2f}s", flush=True)
            if name not in best or t < best[name]:
                best[name] = t
    return {k: round(v, 3) for k, v in best.items()}


# A runaway oracle at the big tier must not fill the disk or hang the run:
# DuckDB's spill is capped, and each query gets a wall-clock budget enforced
# via connection interrupt (the r9 sf10 run found er_blocked's quadratic
# oracle spilling >70 GB of temp before dying on a full disk). A query that
# exceeds either bound records float('inf') — a DNF is itself the data
# point: the single-node engine cannot complete what Spark completed.
DUCK_TEMP_CAP = "40GB"
DUCK_QUERY_BUDGET_S = 900


def duck_serial(sf_dir: str, passes: int = 2, slice_=None) -> dict[str, float]:
    import threading

    def fresh_con():
        c = duck_con(sf_dir)
        c.sql(f"SET max_temp_directory_size='{DUCK_TEMP_CAP}'")
        return c

    con = fresh_con()
    best: dict[str, float] = {}
    for _ in range(passes):
        for name in (slice_ or HEAVY_SLICE):
            if best.get(name) == float("inf"):
                continue  # no second attempt at a DNF
            done = threading.Event()
            fired = threading.Event()

            def watchdog():
                if not done.wait(DUCK_QUERY_BUDGET_S):
                    fired.set()
                    con.interrupt()

            wd = threading.Thread(target=watchdog, daemon=True)
            wd.start()
            t0 = time.perf_counter()
            try:
                con.sql(ORACLE[name]).fetchall()
                t = time.perf_counter() - t0
            except Exception as e:
                t = float("inf")
                print(
                    f"  duckdb {name}: DNF after {time.perf_counter() - t0:.0f}s "
                    f"({type(e).__name__}: {str(e)[:120]})",
                    flush=True,
                )
            else:
                print(f"  duckdb {name}: {t:.2f}s", flush=True)
            finally:
                done.set()
                wd.join()
            if fired.is_set():
                # interrupt() may have landed AFTER the query completed (the
                # wait timed out in the gap before done.set()); the pending
                # interrupt flag would then poison the NEXT statement on
                # this connection into a spurious never-retried DNF (review
                # r9). Whenever the watchdog fired, rebuild the connection
                # so no later query inherits it.
                con.close()
                con = fresh_con()
            if name not in best or t < best[name]:
                best[name] = t
    con.close()
    return {k: (round(v, 3) if v != float("inf") else v) for k, v in best.items()}


def main() -> None:
    sf1_dir = os.path.join(ROOT, ".scratch", "sf1")
    if "--sf1-dir" in sys.argv:
        sf1_dir = sys.argv[sys.argv.index("--sf1-dir") + 1]
    slice_ = list(HEAVY_SLICE)
    if "--queries" in sys.argv:
        slice_ = sys.argv[sys.argv.index("--queries") + 1].split(",")
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    tiers = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)]
    if "--tiers" in sys.argv:
        tiers = [
            tuple(kv.split("=", 1))
            for kv in sys.argv[sys.argv.index("--tiers") + 1].split(",")
        ]
    for _, d in tiers:
        if not os.path.isdir(d):
            sys.exit(f"{d} missing — run tools/scale_testdata.py first")

    spark = get_spark(app="gtl-scale-trend")
    # warm every tier off the clock (codegen + plan cache, bench.py recipe).
    # --no-warmup skips it for minutes-scale tiers (sf100): a warmup pass
    # there costs as much as the measured pass while changing nothing the
    # best-of-1 discipline cares about (codegen warm-up is milliseconds
    # against minutes).
    if "--no-warmup" not in sys.argv:
        for _, d in tiers:
            for name in slice_:
                QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for sf, d in tiers:
        s = spark_serial(spark, d, passes, slice_)
        k = duck_serial(d, passes, slice_)
        out[sf] = {
            "spark": s,
            "duckdb": k,
            "spark_total": round(sum(s.values()), 3),
            "duckdb_total": round(sum(v for v in k.values() if v != float("inf")), 3),
            "duckdb_dnf": sorted(n for n, v in k.items() if v == float("inf")),
        }
        print(f"== {sf}: spark {out[sf]['spark_total']}s  duckdb {out[sf]['duckdb_total']}s", flush=True)

    lo, hi = tiers[0][0], tiers[-1][0]
    rows = []
    for name in slice_:
        row = {"query": name}
        for sf, _ in tiers:
            row[f"{sf}_spark"] = out[sf]["spark"][name]
            dk = out[sf]["duckdb"][name]
            row[f"{sf}_duck"] = dk if dk != float("inf") else "DNF"
            row[f"ratio_{sf}"] = (
                round(out[sf]["spark"][name] / max(dk, 1e-9), 2)
                if dk != float("inf")
                else 0.0  # Spark finished, the oracle did not
            )
        row["trend"] = (
            "shrinks" if row[f"ratio_{hi}"] < row[f"ratio_{lo}"] else "grows"
        )
        if row[f"{hi}_duck"] == "DNF":
            row["trend"] = "oracle DNF (spark finished)"
        rows.append(row)
    print(json.dumps({"slice": rows, "totals": {k: {kk: v[kk] for kk in ("spark_total", "duckdb_total")} for k, v in out.items()}}))


if __name__ == "__main__":
    main()

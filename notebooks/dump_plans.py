"""Regenerate docs/PLANS.md: formatted physical plans of headline queries
with the scale properties to check in each. Run from the repo root:

    python notebooks/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_telemetry_lakehouse_spark.plans import exchange_count, explain_formatted
from gpu_telemetry_lakehouse_spark.queries import QUERIES
from gpu_telemetry_lakehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

# (query, what the plan must show)
SHOWCASE = [
    (
        "tpch_q6_revenue",
        "Filters reach the parquet scan (`PushedFilters`), only 4 of 11 "
        "lineitem columns are read (`ReadSchema`), and the single "
        "aggregation is partial+final (map-side combine) — the whole query "
        "is one scan + one 1-row exchange.",
    ),
    (
        "gold_daily_util",
        "Flagship medallion rollup: NULL-filter pushed to the scan, "
        "timestamp conversion inside whole-stage codegen, one exchange for "
        "the day-grouped aggregation (exact percentile is an ObjectHashAgg), "
        "one for the output sort.",
    ),
    (
        "tpch_q5_local_volume",
        "6-way join: the big sides (orders⨝lineitem⨝customer) shuffle once "
        "each; supplier/nation/region enter as BroadcastHashJoins — no "
        "shuffle for any dimension.",
    ),
    (
        "interval_join_shipments",
        "Interval (range) join planned as an EQUI join on the time bucket "
        "with the range residual as a post-join filter — no "
        "BroadcastNestedLoopJoin/CartesianProduct anywhere.",
    ),
    (
        "theta_join_balance_rank",
        "Inequality join with NO join on the large sides: a broadcast "
        "bucket-histogram join plus bucket-partitioned ranking windows.",
    ),
    (
        "dedup_minhash_sigs",
        "MinHash signatures: hashing is map-side; the only exchange carries "
        "(doc_id, k longs) — document text never shuffles.",
    ),
    (
        "tfidf_top_terms",
        "Corpus statistics: token stream aggregates once; vocab (df) and "
        "N_docs return as broadcasts; the per-doc ranking window is the "
        "only second shuffle.",
    ),
    (
        "embedding_quantize_error",
        "Vector op entirely in JVM higher-order array expressions — no "
        "BatchEvalPython/ArrowEvalPython stage; one partial+final "
        "aggregation by label.",
    ),
    (
        "gold_job_efficiency_daily",
        "Reference future-work mart (jobs × telemetry): the interval join "
        "carries the user_id EQUI key with the time predicate evaluated "
        "inside a BroadcastHashJoin of the jobs dim — the telemetry (100 TB) "
        "side never shuffles for the join; day explode is a narrow "
        "generator; per-(job,day) rollup is one hash aggregation.",
    ),
    (
        "dedup_boilerplate_segments",
        "Repeated-segment boilerplate strip: chunking+hashing is map-side "
        "(only 8-byte segment hashes ever shuffle, never text); the "
        "boilerplate set (df > cap — the quadratically-repeated sliver of "
        "the corpus) flags back as a BroadcastHashJoin; per-doc retention "
        "is one hash aggregation.",
    ),
    (
        "benchmark_decontam",
        "Eval-set scrub: the benchmark side collapses to ONE distinct set "
        "of 5-gram hashes (bounded by the benchmark corpus) and probes the "
        "training side as a BroadcastHashJoin on longs; the training text "
        "is tokenized+hashed exactly once, per-doc hit counts are one "
        "exchange.",
    ),
    (
        "semdedup_prune",
        "SemDeDup cluster-then-prune: centroid assignment is a row-local "
        "literal projection (zero shuffles for the 100 TB side); pairwise "
        "cosine exists ONLY inside the per-cluster equi join, so all-pairs "
        "never materializes; the dropped-id set is duplicate-sized and "
        "joins back broadcast under AQE.",
    ),
    (
        "gold_hot_throttled_gpus",
        "Simulated GPU-health mart: one scan, metric derivation inside "
        "whole-stage codegen, one (gpu_id, dt) hash aggregation with the "
        "HAVING health predicate applied at the aggregate — only unhealthy "
        "device-days leave the exchange.",
    ),
    (
        "naive_bayes_lang_confusion",
        "Distributed NB classifier: training is two map-side-combined "
        "aggregations (class/token counts, priors); scoring joins test "
        "tokens against the vocab-sized count table hash-partitioned on "
        "token; the |classes|-row stats frame broadcasts; the argmax "
        "window partitions by doc_id over 5 rows per doc. No Python "
        "stages, no driver-side model state.",
    ),
    (
        "decision_stump_returns",
        "Histogram tree induction: the label join shuffles on orderkey "
        "once, the 50-cell contingency aggregation is partial+final, and "
        "ALL split search (cumulative windows + Gini argmin) runs over "
        "<=13 rows — the single-partition window warnings apply to "
        "candidate-set-sized data, not the corpus.",
    ),
    (
        "setsim_join_prefix",
        "Adaptive exact set-similarity (round 4): on this dictionary-dense "
        "corpus (31-token vocab) the strategy dispatch picks the bitmask "
        "path — token sets dictionary-encode to one 64-bit mask, the join "
        "runs at the DISTINCT-MASK level as a broadcast nested-loop over "
        "the mask histogram with two codegen bit_counts per pair, and the "
        "per-doc answer aggregates at mask level (doc pairs never "
        "materialize). The sparse-vocab PPJoin path remains for real text. "
        "153s -> 2.2s at sf0.1.",
    ),
    (
        "asof_enrich_orders",
        "Two-table as-of join as the union+window rewrite (round 4): both "
        "sides tagged and unioned, ONE co-partitioning exchange on the "
        "key, and a running max over (ts, kind) delivers every event's "
        "latest prior order in a single codegen window pass — replacing "
        "the cogrouped-pandas plan whose per-key Python round-trips cost "
        "18s at sf0.1 (0.5s now). The cogroup operator remains the "
        "escape hatch for per-key logic that genuinely outgrows SQL.",
    ),
]

HEADER = """# PLANS — physical-plan evidence for the 100 TB contract

GENERATED by `notebooks/dump_plans.py` (sf0.01 inputs; plan shapes are
size-independent apart from AQE's runtime coalescing). Each section states
the property the plan must exhibit, then the `explain("formatted")` output.
The same properties are enforced in CI by `tests/test_plans.py`.
"""


def main() -> None:
    spark = get_spark(app="dump-plans", cpus=8)
    out = [HEADER]
    for name, why in SHOWCASE:
        df = QUERIES[name](spark, SF_DIR)
        plan = explain_formatted(df)
        out.append(
            f"\n## {name}\n\n{why}\n\n"
            f"Exchanges: {exchange_count(plan)}\n\n```\n{plan.strip()}\n```\n"
        )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "PLANS.md"), "w") as f:
        f.write("".join(out))
    print(f"wrote docs/PLANS.md with {len(SHOWCASE)} plans")
    spark.stop()


if __name__ == "__main__":
    main()

"""Physical-plan quality gates: the properties that make these queries hold
at 100 TB must be visible in the plan, not just asserted in docstrings.

Each test pins one scale property: filters reach the parquet scan, small
dims broadcast, row-local operators stay exchange-free, grouped aggregation
keeps its map-side partial phase, and wide tables are column-pruned at the
source.
"""

from __future__ import annotations

from gpu_telemetry_lakehouse_spark import plans as P
from gpu_telemetry_lakehouse_spark.queries import QUERIES


def plan_of(spark, name, sf_dir) -> str:
    return P.explain_formatted(QUERIES[name](spark, sf_dir))


def test_filters_push_into_parquet_scan(spark, sf_dir):
    """q6's range+band predicates must all reach the scan (row-group skip)."""
    p = plan_of(spark, "tpch_q6_revenue", sf_dir)
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert pushed and "PushedFilters: []" not in pushed[0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed[0], f"{frag} not pushed: {pushed[0]}"


def test_small_dims_broadcast(spark, sf_dir):
    """Dimension joins must be broadcast, never shuffled-hash/sort-merge."""
    for name in ("join_broadcast_dims", "tpch_q5_local_volume", "pivot_status_by_nation"):
        p = plan_of(spark, name, sf_dir)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_row_local_operators_have_no_exchange(spark, sf_dir):
    """Text featurization and fingerprinting are map-side only — at 100 TB an
    accidental shuffle here moves the whole corpus."""
    for name in ("text_stats", "text_quality_score", "doc_fingerprint", "casts_flags"):
        p = plan_of(spark, name, sf_dir)
        assert "Exchange" not in p, f"{name} has a shuffle:\n{p[:800]}"


def test_grouped_agg_keeps_partial_phase(spark, sf_dir):
    """Map-side combine before the exchange: shuffle carries one row per
    (partition, group), not one per input row."""
    for name in ("tpch_q1", "gold_daily_util", "events_hourly_window"):
        p = plan_of(spark, name, sf_dir)
        assert "partial_" in p, name
        # exactly one data exchange for a single group-by (ignore AQE reuse)
        n_exch = sum(1 for l in p.splitlines() if l.strip().startswith("(")
                     and ") Exchange" in l)
        assert n_exch <= 2, f"{name}: {n_exch} exchanges"


def test_column_pruning_reaches_scan(spark, sf_dir):
    """topk_orders touches 3 of 6 order columns; the scan must not read more."""
    p = plan_of(spark, "topk_orders", sf_dir)
    scan_schema = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scan_schema, p[:500]
    line = scan_schema[0]
    assert line.count(":") < 6, f"scan reads all orders columns: {line}"
    assert "o_orderpriority" not in line, line


def test_decorrelated_aggregate_sides_broadcast(spark, sf_dir):
    """Subquery shapes: the aggregate (threshold) side is small and must come
    back as a broadcast join — the fact table never re-shuffles on the
    correlation key."""
    for name in (
        "small_quantity_revenue",
        "idle_balance_customers",
        "above_type_avg_parts",
        "promo_revenue_share",
    ):
        p = plan_of(spark, name, sf_dir)
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_semi_anti_never_materialize_payload(spark, sf_dir):
    """EXISTS/NOT EXISTS compile to LeftSemi/LeftAnti — no row multiplication,
    probe side carries only the join key."""
    p = plan_of(spark, "supplier_churn_9798", sf_dir)
    assert "LeftSemi" in p and "LeftAnti" in p, p[:800]


def test_array_fold_is_row_local(spark, sf_dir):
    """The per-vector norm fold happens in the scan stage; only the top-k
    sort exchanges rows."""
    p = plan_of(spark, "array_norms_vectors", sf_dir)
    assert "TakeOrderedAndProject" in p, p[:800]
    n_exch = sum(
        1 for l in p.splitlines() if l.strip().startswith("(") and ") Exchange" in l
    )
    assert n_exch == 0, f"array fold shuffles: {n_exch}"


def test_heavy_joins_stay_broadcast(spark, sf_dir):
    """The q7/q8/q9/q21 analogues stream the fact table through broadcast
    hash joins — the only exchanges are the final group-bys (and, for q21,
    the per-order distinct-count that co-partitions with the fact join)."""
    for name, max_exch in (
        ("nation_pair_volume", 2),
        ("nation_market_share", 2),
        ("product_profit_by_nation", 2),
        ("priority_line_counts", 2),
        ("sole_fault_suppliers", 3),
        # q2 argmin: distinct + per-part-min + final sort; q11: slice agg +
        # 1-row grand total + final sort — dims all broadcast either way
        ("cheapest_supplier_per_part", 3),
        ("important_parts_value_share", 4),
    ):
        p = plan_of(spark, name, sf_dir)
        assert "SortMergeJoin" not in p, name
        n_exch = sum(
            1 for l in p.splitlines() if l.strip().startswith("(") and ") Exchange" in l
        )
        assert n_exch <= max_exch, f"{name}: {n_exch} exchanges"


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The no-equi-key point-in-interval join must plan as a hash/broadcast
    equi-join on the time bucket — a BroadcastNestedLoopJoin or
    CartesianProduct here is O(n·m) row comparisons against the full event
    stream at 100 TB."""
    p = plan_of(spark, "range_join_busy_windows", sf_dir)
    assert "BroadcastNestedLoopJoin" not in p, p[:800]
    assert "CartesianProduct" not in p, p[:800]
    assert "HashJoin" in p or "SortMergeJoin" in p, p[:800]


def test_minhash_shuffle_is_narrow(spark, sf_dir):
    """The minhash signature shuffle must carry only (doc_id, k longs) —
    never document text."""
    p = plan_of(spark, "dedup_minhash_sigs", sf_dir)
    # Only hash-partition (aggregation/join) exchanges matter: the optional
    # spread_input round-robin exists solely because local testdata is one
    # split — at cluster split counts it disappears from the plan entirely.
    import re

    for m in re.finditer(r"\(\d+\) Exchange\n(?:.*\n){0,3}", p):
        if "hashpartitioning" in m.group(0):
            assert "text#" not in m.group(0), m.group(0)


def test_plan_helpers_api(spark, sf_dir):
    """The package-level plan gates (plans.py) behave like the raw string
    checks above — a deployment can use them on its own queries."""
    q6 = QUERIES["tpch_q6_revenue"](spark, sf_dir)
    P.assert_pushed_filter(q6, "l_shipdate", "l_discount", "l_quantity")
    P.assert_partial_aggregation(QUERIES["tpch_q1"](spark, sf_dir))
    P.assert_no_exchange(QUERIES["text_stats"](spark, sf_dir))
    P.assert_broadcast_only(QUERIES["tpch_q5_local_volume"](spark, sf_dir))
    P.assert_read_schema_excludes(
        QUERIES["topk_orders"](spark, sf_dir), "o_orderpriority"
    )
    assert P.exchange_count(QUERIES["gold_daily_util"](spark, sf_dir)) <= 2


def test_new_query_plans(spark, sf_dir):
    """Gates for the sketch/sampling additions: heavy-hitter recount joins
    by broadcast (candidates are tiny by construction); hash-gate sampling
    adds no exchange beyond its aggregation."""
    hh = QUERIES["heavy_hitter_users"](spark, sf_dir)
    p = P.explain_formatted(hh)
    assert "Broadcast" in p and "SortMergeJoin" not in p, p[:800]
    hs = QUERIES["hash_sample_orders"](spark, sf_dir)
    assert P.exchange_count(hs) <= 1, P.explain_formatted(hs)[:800]


def test_kcore_keep_set_single_evaluation(spark, sf_dir):
    """VERDICT r4 #4: each k-core round's degree aggregation feeds the keep
    set (both semi-join probes) AND the round's trace row, and the static
    plan shows no ReusedExchange for duplicated agg subplans — so the query
    checkpoints deg per round and the returned plan must consist of trace
    aggregations over the checkpointed deg frames ONLY: no join may appear
    (probes live behind the checkpoints), and each of the 3 union branches
    carries exactly one partial+final aggregate pair over a Scan
    ExistingRDD. A regression (checkpoint dropped, degree agg re-inlined
    per probe) re-introduces semi joins and extra HashAggregates into the
    returned plan and doubles the tail-setter's aggregation work."""
    df = QUERIES["kcore_peel_trace"](spark, sf_dir)
    p = P.explain_formatted(df)
    assert "Join" not in p, p[:1500]
    assert p.count("Scan ExistingRDD") >= 6, p[:1500]  # 3 branches x 2 mentions
    # 3 branches x (partial + final) aggs, each printed twice by the
    # formatted explain (tree line + detail header) = 12 mentions; anything
    # above means a degree aggregation leaked back into the returned plan
    assert p.count("HashAggregate") <= 12, p[:1500]


def test_theta_join_plan_has_no_nested_loop(spark, sf_dir):
    """The inequality join is re-planned as bucketed rank counting: no
    BroadcastNestedLoopJoin / CartesianProduct may appear, the histogram
    joins back by broadcast, and the windows are bucket-partitioned."""
    df = QUERIES["theta_join_balance_rank"](spark, sf_dir)
    p = P.explain_formatted(df)
    assert "NestedLoop" not in p and "CartesianProduct" not in p, p[:1200]
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p[:1200]


def test_quantize_plan_stays_jvm_side(spark, sf_dir):
    """Quantization must compile to higher-order array expressions — no
    Python UDF stage (BatchEvalPython/ArrowEvalPython) in the plan."""
    df = QUERIES["embedding_quantize_error"](spark, sf_dir)
    p = P.explain_formatted(df)
    assert "EvalPython" not in p, p[:1200]
    P.assert_partial_aggregation(df)


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With production thresholds a selective dim filter over a big fact join
    injects a bloom filter into the fact side (on by default in our session).
    The application-side size gate is 10GB, so locally we lower only that."""
    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from pyspark.sql import functions as F

    conf = spark.conf
    old_bcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_app = conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1B",
        )
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        P.assert_runtime_bloom_filter(j)
        assert j.count() >= 0  # plan executes with the filter in place
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_app,
        )


def test_tfidf_and_logprob_broadcast_vocab(spark, sf_dir):
    """Corpus-statistics queries must broadcast the vocab/total side back to
    the token stream — a sort-merge join on token would re-shuffle the whole
    token stream a second (and third) time."""
    for name in ("tfidf_top_terms", "doc_unigram_logprob"):
        p = P.explain_formatted(QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, (name, p[:1000])


def test_measured_map_side_combine(spark, sf_dir):
    """Runtime-metric gate: gold rollup and q1 must MEASURABLY collapse rows
    before their exchanges (shuffleRecordsWritten << scanned rows), and the
    metrics API exposes per-operator runtime values."""
    for name in ("gold_daily_util", "tpch_q1"):
        P.assert_map_side_combine(QUERIES[name](spark, sf_dir), factor=10)
    m = P.executed_metrics(QUERIES["tpch_q6_revenue"](spark, sf_dir))
    names = [n for n, _ in m]
    assert any("Scan" in n for n in names)


def test_plan_budget_no_regression(spark, sf_dir):
    """Plan-regression net: every query's exchange count must not exceed its
    recorded budget (tests/plan_budget.json), and no query may grow a Python
    eval stage it didn't have. A legitimate plan change regenerates the
    budget file (see its docgen snippet in the repo history) — silent
    regressions fail here instead of surfacing as bench slowdowns rounds
    later. Budgets were recorded at sf0.01; plan shape is size-independent."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "plan_budget.json")
    with open(path) as f:
        budget = json.load(f)
    failures = []
    for name, b in sorted(budget.items()):
        if name not in QUERIES:
            continue  # renamed/removed query: regenerate the budget file
        p = P.explain_formatted(QUERIES[name](spark, sf_dir))
        got = P.exchange_count(p)
        if got > b["exchanges"]:
            failures.append(f"{name}: exchanges {got} > budget {b['exchanges']}")
        if not b["python_eval"] and "EvalPython" in p:
            failures.append(f"{name}: grew a Python eval stage")
    assert not failures, "\n".join(failures)


def test_sql_broadcast_hint_honored(spark, sf_dir):
    """The SQL /*+ BROADCAST */ hint must produce BroadcastHashJoins for the
    hinted relations regardless of size estimates (no SortMergeJoin)."""
    df = QUERIES["hinted_join_revenue"](spark, sf_dir)
    p = P.explain_formatted(df)
    assert p.count("BroadcastHashJoin") >= 2 and "SortMergeJoin" not in p, p[:1200]


def test_partition_pruning_static_and_dynamic(spark, sf_dir, tmp_path):
    """Partition pruning through joins, both flavors Spark offers:

    1. dim filtered ON the join key -> Catalyst infers a STATIC partition
       filter on the fact scan (constraint propagation, better than DPP —
       no runtime subquery at all);
    2. dim filtered on a NON-key column -> partition values are only known
       at runtime, so a dynamicpruning subquery must be injected on the
       fact scan (Spark DPP).

    At 100 TB these decide whether a date/priority-partitioned fact table
    scans every partition or only the dim-selected ones."""
    import os

    from pyspark.sql import functions as F

    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from gpu_telemetry_lakehouse_spark.operators.scale import write_partitioned

    fact = os.path.join(str(tmp_path), "orders_part")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "prio", F.col("o_orderpriority")
    )
    write_partitioned(o, fact, ["prio"])
    f = spark.read.parquet(fact)

    # 1. static inference: literal key filter crosses the join onto the scan
    dim_key = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderpriority").alias("prio"))
        .distinct()
    )
    j1 = f.join(dim_key, "prio").groupBy("prio").count()
    p1 = j1._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in line and "1-URGENT" in line
        for line in p1.splitlines()
    ), p1[:1500]

    # 2. runtime DPP: non-key predicate -> dynamicpruning subquery
    dim_rt = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderpriority").alias("prio"))
        .distinct()
    )
    j2 = f.join(dim_rt, "prio").groupBy("prio").count()
    p2 = j2._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p2.lower(), p2[:1500]

    # and both answer correctly
    want1 = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert {r["prio"]: r["count"] for r in j1.collect()} == {"1-URGENT": want1}
    assert j2.groupBy().sum("count").first()[0] == f.join(
        dim_rt, "prio"
    ).count()


def test_global_ranking_windows_avoid_full_single_partition_sort(spark, sf_dir):
    """VERDICT r3 #4: global top-k rankings must not silently regress into a
    single-partition full sort of the unreduced input.

    - bm25_search / top_event_paths: the ``row_number() <= k`` over a global
      order must plan as WindowGroupLimit or the TakeOrderedAndProject
      rewrite (per-partition limit before the singleton final), never a
      bare global Window.
    - pareto_customer_revenue: the global cumulative window is inherent to
      the Pareto curve, but it must run over the customer-level
      HashAggregate rollup, never the raw order stream.
    - doc_length_deciles: global ntile needs a total order by definition;
      pin that the single-partition sort carries ONLY the narrow
      (doc_id, n_tokens) projection, not the corpus text.
    """
    import re

    for name in ("bm25_search", "top_event_paths"):
        p = plan_of(spark, name, sf_dir)
        assert ("WindowGroupLimit" in p) or ("TakeOrderedAndProject" in p), (
            f"{name}: global rank-limit lost its limited rewrite:\n{p[:1200]}"
        )

    p = plan_of(spark, "pareto_customer_revenue", sf_dir)
    nodes = re.findall(r"\(\d+\) (\w+)", p)
    wi = nodes.index("Window")
    assert "HashAggregate" in nodes[:wi], (
        f"pareto window must consume the customer rollup, got {nodes}"
    )

    p = plan_of(spark, "doc_length_deciles", sf_dir)
    # the Window node's Input line lists the columns crossing the singleton
    # exchange — the raw text column must have been pruned away before it
    m = re.search(r"\(\d+\) Window\b.*?Input \[\d+\]: \[([^\]]*)\]", p, re.S)
    assert m, p[:1200]
    cols = [c.strip().split("#")[0] for c in m.group(1).split(",")]
    assert "text" not in cols and len(cols) <= 3, (
        f"deciles global sort carries wide input: {cols}"
    )

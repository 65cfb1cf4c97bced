"""Plan-quality introspection: the properties that make a query hold at
100 TB, readable (and assertable) from the physical plan.

`tests/test_plans.py` pins these properties for the shipped queries; the
helpers live here so a deployment can gate ITS queries the same way — e.g.
`assert_broadcast_only(df)` in a CI check before a new report ships, or
`exchange_count(df)` in a notebook while tuning. Each helper reads the
formatted explain output (the same text `df.explain("formatted")` prints).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (without printing it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def exchange_count(df_or_plan: DataFrame | str) -> int:
    """Number of Exchange (shuffle) operators in the plan. Every exchange
    rewrites the working set to disk+network once — the first thing to
    count when a query slows down at scale."""
    p = df_or_plan if isinstance(df_or_plan, str) else explain_formatted(df_or_plan)
    return sum(
        1 for l in p.splitlines() if l.strip().startswith("(") and ") Exchange" in l
    )


def pushed_filters(df_or_plan: DataFrame | str) -> list[str]:
    """The PushedFilters lines of every scan in the plan."""
    p = df_or_plan if isinstance(df_or_plan, str) else explain_formatted(df_or_plan)
    return [l.strip() for l in p.splitlines() if "PushedFilters" in l]


def assert_pushed_filter(df: DataFrame, *fragments: str) -> None:
    """Every named column/fragment must appear in a scan's pushed filters —
    i.e. the predicate reaches parquet row-group skipping."""
    lines = pushed_filters(df)
    assert lines and any("[]" not in l for l in lines), "no filters pushed"
    blob = "\n".join(lines)
    for frag in fragments:
        assert frag in blob, f"{frag!r} not pushed: {blob}"


def assert_no_exchange(df: DataFrame) -> None:
    """Row-local pipelines (featurization, casts, filters) must plan with
    zero shuffles; an accidental exchange moves the whole corpus."""
    p = explain_formatted(df)
    assert "Exchange" not in p, f"unexpected shuffle:\n{p[:800]}"


def assert_broadcast_only(df: DataFrame) -> None:
    """All joins in the plan are broadcast — no sort-merge/shuffled-hash of
    a dimension that should ship to the executors instead."""
    p = explain_formatted(df)
    assert "BroadcastHashJoin" in p or "Join" not in p, p[:800]
    assert "SortMergeJoin" not in p, f"sort-merge join in plan:\n{p[:800]}"


def assert_partial_aggregation(df: DataFrame) -> None:
    """Grouped aggregation keeps its map-side partial phase, so the shuffle
    carries one row per (task, group) instead of one per input row."""
    p = explain_formatted(df)
    assert "partial_" in p, f"no map-side partial aggregation:\n{p[:800]}"


def assert_read_schema_excludes(df: DataFrame, *cols: str) -> None:
    """Column pruning reached the scan: none of ``cols`` is read."""
    p = explain_formatted(df)
    lines = [l for l in p.splitlines() if "ReadSchema" in l]
    assert lines, p[:500]
    for c in cols:
        for l in lines:
            assert c not in l, f"scan reads pruned column {c}: {l}"


def narrow_hash_exchanges(df_or_plan: DataFrame | str, forbidden: str = "text#") -> None:
    """Assert no hash-partition exchange carries the ``forbidden`` column —
    e.g. shuffles of a dedup pipeline must move hashes, not document text."""
    p = df_or_plan if isinstance(df_or_plan, str) else explain_formatted(df_or_plan)
    for m in re.finditer(r"\(\d+\) Exchange\n(?:.*\n){0,3}", p):
        if "hashpartitioning" in m.group(0):
            assert forbidden not in m.group(0), m.group(0)


def assert_runtime_bloom_filter(df: DataFrame) -> None:
    """The optimizer must have injected a runtime bloom filter: the selective
    dimension side builds a bloom_filter_agg whose might_contain probe is
    applied to the fact side BEFORE its shuffle — at scale this drops most of
    the fact scan's output on the map side of a shuffle join. Fires under the
    production thresholds (creation side ≤ 10MB after filtering, application
    scan ≥ 10GB); tests lower the application threshold to trigger it at
    local data sizes."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan and "bloom_filter_agg" in plan, (
        "no runtime bloom filter injected:\n" + plan[:1500]
    )


def executed_metrics(df: DataFrame) -> list[tuple[str, dict]]:
    """Execute ``df`` and return per-operator SQL metrics from ITS OWN query
    execution — (nodeName, {metric: value}) in plan order, descending through
    AQE query stages. This is runtime observability (rows/bytes/spills that
    actually happened), complementing the static shape checks above. Uses
    collect() so the metrics belong to this execution; intended for
    diagnostics and tests, not for result-set-sized production outputs."""
    df.collect()
    out: list[tuple[str, dict]] = []
    seen: set[int] = set()

    def walk(node) -> None:
        if node.id() in seen:
            return
        seen.add(node.id())
        it = node.metrics().iterator()
        vals: dict = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        out.append((node.nodeName(), vals))
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        name = node.nodeName()
        if name.endswith("QueryStage"):
            walk(node.plan())
        elif name == "AdaptiveSparkPlan":
            walk(node.executedPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def assert_map_side_combine(df: DataFrame, factor: int = 10) -> None:
    """MEASURED partial-aggregation gate: the records actually written to the
    shuffle must be at least ``factor``x fewer than the rows the scans
    produced — i.e. the map-side combine really collapsed the data before
    the exchange, not just in the plan picture."""
    metrics = executed_metrics(df)
    # A columnar scan reports the same rows on both 'Scan parquet' and its
    # 'ColumnarToRow' conversion — summing both would double 'scanned' and
    # silently halve the enforced factor. Count exactly one operator class.
    scanned = sum(
        d.get("numOutputRows", 0) for n, d in metrics if n == "ColumnarToRow"
    ) or sum(
        d.get("numOutputRows", 0)
        for n, d in metrics
        if n in ("Scan parquet", "BatchScan")
    )
    shuffled = sum(
        d.get("shuffleRecordsWritten", 0) for n, d in metrics if n == "Exchange"
    )
    assert scanned > 0 and shuffled > 0, metrics
    assert shuffled * factor <= scanned, (
        f"shuffle carried {shuffled} records for {scanned} scanned rows — "
        "partial aggregation is not collapsing the data"
    )

"""Physical-layout operators (operators/scale.py): the 100 TB story must be
visible in the plan — partition pruning at the scan, zero exchanges on
bucketed joins, bounded reducer load on skewed aggregations — while results
stay bit-identical to the naive plans."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.operators import scale as SC


def plan_of(df) -> str:
    # AQE's toString repeats the tree under "== Initial Plan ==" — keep only
    # the final physical plan so operator counts aren't doubled.
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==", 1)[0]


@contextlib.contextmanager
def conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "p_status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_by_status")
    SC.write_partitioned(orders, path, ["p_status"])

    back = spark.read.parquet(path)
    pruned = back.filter(F.col("p_status") == "F")
    plan = plan_of(pruned)
    # The partition filter must be applied at planning time (directory
    # pruning), not as a row-level data filter over all partitions.
    assert "PartitionFilters" in plan and "p_status" in plan.split("PartitionFilters", 1)[1]

    expect = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == expect


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    SC.write_bucketed(
        li.withColumnRenamed("l_orderkey", "orderkey"),
        "t_li_bucketed",
        str(tmp_path / "li"),
        ["orderkey"],
        n_buckets=4,
        sort_cols=["orderkey"],
    )
    SC.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "t_ord_bucketed",
        str(tmp_path / "ord"),
        ["orderkey"],
        n_buckets=4,
        sort_cols=["orderkey"],
    )
    try:
        # Force the SMJ path (the point is exchange-free fact-to-fact joins;
        # broadcast would hide it at test scale). The legacy conf makes the
        # scan report per-bucket sort order so the read-side sort is elided
        # too (Spark 3.0+ hides it by default).
        with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), conf(
            spark, "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        ):
            joined = SC.bucketed_join(spark, "t_li_bucketed", "t_ord_bucketed", ["orderkey"])
            plan = plan_of(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
            # Pre-sorted buckets: no Sort operator above the scans either.
            assert "Sort " not in plan.replace("SortMergeJoin", ""), plan[:800]

            expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
            assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_two_phase_distinct_matches_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rewritten = SC.two_phase_distinct(ev, ["event_type"], "user_id")
    naive = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct_user_id")
    )
    assert sorted(map(tuple, rewritten.collect())) == sorted(map(tuple, naive.collect()))
    # Two exchanges max: (event_type, user_id) dedup then per-key count.
    assert plan_of(rewritten).count("Exchange") <= 2


def test_salted_collect_matches_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(2000)
    salted = SC.salted_collect(ev, ["event_type"], "user_id", n_salt=8)
    naive = ev.groupBy("event_type").agg(
        F.array_sort(F.collect_set("user_id")).alias("user_id_set")
    )
    got = {r["event_type"]: list(r["user_id_set"]) for r in salted.collect()}
    want = {r["event_type"]: list(r["user_id_set"]) for r in naive.collect()}
    assert got == want
    # The wide exchange is keyed (key, salt): hash partitioning on both.
    plan = plan_of(salted)
    assert "__salt" in plan


def test_salt_col_is_deterministic_and_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id").limit(500)
    salted = ev.withColumn("s", SC.salt_col("user_id", 16))
    rows = salted.collect()
    assert all(0 <= r["s"] < 16 for r in rows)
    again = {(r["user_id"], r["s"]) for r in salted.collect()}
    assert {(r["user_id"], r["s"]) for r in rows} == again


def test_salted_join_matches_naive(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = SC.salted_join(li, orders, on="l_orderkey", n_salt=8)
    naive = li.join(orders, "l_orderkey")
    assert salted.count() == naive.count()
    got = sorted(map(tuple, salted.collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want
    # the join key must be (key, salt): hash partitioning carries __salt
    plan = plan_of(salted)
    assert "__salt" in plan


def test_approx_percentile_tracks_exact_tier(spark, sf_dir):
    """The sketch's error bound is in RANK space (±1/accuracy of position),
    not value space. Since round 4 the query certifies this itself: per day
    it emits tie-robust rank-interval flags for p95/median (the VERDICT r3
    #7 bounded-oracle shape) — so the gate asserts every flag is 1 and the
    exact tier's counts and exact-avg path are identical."""
    from gpu_telemetry_lakehouse_spark.queries import QUERIES

    exact = {r["dt"]: r for r in QUERIES["gold_daily_util"](spark, sf_dir).collect()}
    approx = {r["dt"]: r for r in QUERIES["gold_daily_util_approx"](spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for dt, e in exact.items():
        a = approx[dt]
        assert a["n_samples"] == e["n_samples"]
        assert a["avg_value"] == e["avg_value"]  # avg path identical/exact
        assert a["p95_ok"] == 1 and a["med_ok"] == 1, (dt, dict(a.asDict()))


def test_dynamic_partition_overwrite_is_incremental(spark, sf_dir, tmp_path):
    """Refreshing one day must rewrite only that day's directory: untouched
    partitions keep their exact files (names + bytes), and the refreshed
    partition's content replaces (not appends to) the old rows."""
    import glob
    import hashlib
    import os

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts")).cast("string")
    )
    gold = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    path = str(tmp_path / "gold_by_day")
    SC.write_partitioned(gold, path, ["day"])

    def snapshot(day: str):
        files = sorted(glob.glob(os.path.join(path, f"day={day}", "*.parquet")))
        return [(f, hashlib.md5(open(f, "rb").read()).hexdigest()) for f in files]

    days = sorted(r["day"] for r in gold.select("day").distinct().collect())
    target, untouched = days[0], days[1]
    before_untouched = snapshot(untouched)

    patch = (
        gold.filter(F.col("day") == target)
        .withColumn("n", F.col("n") + 1000)
    )
    SC.overwrite_dynamic_partitions(patch, path, ["day"])

    assert snapshot(untouched) == before_untouched, "untouched partition rewritten"
    back = spark.read.parquet(path)
    # partition-dir values re-infer as DATE on read; compare as strings
    got = {str(r["day"]): r["n"] for r in back.collect()}
    want = {r["day"]: r["n"] + (1000 if r["day"] == target else 0) for r in gold.collect()}
    assert got == want


def _files(path):
    import os

    out = []
    for root, _d, files in os.walk(str(path)):
        out += [
            os.path.join(root, f) for f in files if not f.startswith(("_", "."))
        ]
    return sorted(out)


def test_upsert_by_key(spark, sf_dir, tmp_path):
    """MERGE semantics: updated keys replaced, new keys inserted, untouched
    partitions' files not rewritten."""
    lake = str(tmp_path / "orders")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    SC.write_partitioned(o, lake, ["o_month"])
    months = sorted(r[0] for r in o.select("o_month").distinct().collect())
    hot, cold = months[0], months[-1]
    before_cold = _files(tmp_path / "orders" / f"o_month={cold}")

    base = spark.read.parquet(lake)
    base_count = base.count()
    victim = base.filter(F.col("o_month") == hot).limit(3).collect()
    updates = spark.createDataFrame(
        [
            # updated existing keys: price bumped
            *[
                (r.o_orderkey, r.o_custkey, r.o_orderstatus, 99999.0,
                 r.o_orderdate, r.o_orderpriority, r.o_month)
                for r in victim
            ],
            # brand-new key in the same partition
            (10**12, 1, "N", 1.0, victim[0].o_orderdate, "1-URGENT", hot),
        ],
        base.schema,
    )
    SC.upsert_by_key(spark, lake, updates, ["o_orderkey"], ["o_month"])

    after = spark.read.parquet(lake)
    assert after.count() == base_count + 1
    got = {
        r.o_orderkey: r.o_totalprice
        for r in after.filter(F.col("o_totalprice") == 99999.0).collect()
    }
    assert set(got) == {r.o_orderkey for r in victim}
    assert after.filter(F.col("o_orderkey") == 10**12).count() == 1
    # untouched partition: byte-identical files
    assert _files(tmp_path / "orders" / f"o_month={cold}") == before_cold


def test_compact_partitions(spark, sf_dir, tmp_path):
    """Compaction collapses a fragmented partition to few files without
    changing its rows."""
    lake = str(tmp_path / "events")
    ev = load_table(spark, sf_dir, "events")
    # fragment: many tiny files per event_type partition
    ev.repartition(40).write.partitionBy("event_type").parquet(lake)
    n_before = len(_files(tmp_path / "events"))
    want = sorted(tuple(r) for r in spark.read.parquet(lake).collect())

    SC.compact_partitions(spark, lake, ["event_type"])

    n_after = len(_files(tmp_path / "events"))
    got = sorted(tuple(r) for r in spark.read.parquet(lake).collect())
    n_parts = spark.read.parquet(lake).select("event_type").distinct().count()
    assert got == want
    assert n_after == n_parts, f"{n_after} files for {n_parts} partitions"
    assert n_before > n_after


def test_schema_evolution_mergeschema(spark, sf_dir, tmp_path):
    from gpu_telemetry_lakehouse_spark.sources import read_parquet_evolved

    path = str(tmp_path / "t")
    ev = load_table(spark, sf_dir, "events")
    ev.select("event_id", "user_id").write.parquet(path)
    ev.select("event_id", "user_id", "value").limit(10).write.mode(
        "append"
    ).parquet(path)
    df = read_parquet_evolved(spark, path)
    assert set(df.columns) == {"event_id", "user_id", "value"}
    n = ev.count()
    assert df.count() == n + 10
    assert df.filter(F.col("value").isNull()).count() >= n


def test_export_shards_deterministic_verified(spark, sf_dir, tmp_path):
    from gpu_telemetry_lakehouse_spark.functions import md5_int
    from gpu_telemetry_lakehouse_spark.operators import shard as SH

    docs = load_table(spark, sf_dir, "documents")
    out1 = str(tmp_path / "shards1")
    out2 = str(tmp_path / "shards2")
    m1 = SH.export_shards(docs, out1, n_shards=8, key="doc_id")
    m2 = SH.export_shards(docs, out2, n_shards=8, key="doc_id")
    # deterministic: identical manifests across reruns
    assert m1 == m2
    assert m1["total_rows"] == docs.count()
    assert set(m1["shards"]) == set(range(8))
    # coverage: union of shards is exactly the input (no loss, no dup)
    back = spark.read.parquet(out1)
    assert back.count() == docs.count()
    assert back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
    # assignment law: every row's directory matches the portable hash
    mism = back.filter(
        F.col("_shard") != F.pmod(md5_int(F.col("doc_id").cast("string")), F.lit(8))
    )
    assert mism.count() == 0
    # in-shard sort order is the declared key order
    one = back.filter(F.col("_shard") == 0).select("doc_id").toPandas()["doc_id"]
    assert list(one) == sorted(one)
    # consumer-side integrity gate passes; a tampered manifest fails
    assert SH.verify_shards(spark, out1)
    m = SH.read_manifest(out1)
    m["shards"][0]["rows"] += 1
    import json as _json
    import os as _os

    with open(_os.path.join(out1, SH.MANIFEST_NAME), "w") as f:
        _json.dump({**m, "shards": {str(k): v for k, v in m["shards"].items()}}, f)
    with pytest.raises(ValueError, match="shard verification failed"):
        SH.verify_shards(spark, out1)


def test_dense_ids_matches_global_row_number(spark, sf_dir):
    from gpu_telemetry_lakehouse_spark.operators.scale import dense_ids
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    got = dense_ids(o, ["o_orderkey"]).select("o_orderkey", "row_id")
    want = o.select(
        "o_orderkey",
        (F.row_number().over(W.orderBy("o_orderkey")) - 1).cast("long").alias("row_id"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # dense + deterministic: rerun equals first run
    again = dense_ids(o, ["o_orderkey"]).select("o_orderkey", "row_id")
    assert got.exceptAll(again).count() == 0
    # window runs per range-partition (__pid in the spec), never globally
    from gpu_telemetry_lakehouse_spark import plans as P

    p = P.explain_formatted(dense_ids(o, ["o_orderkey"]))
    assert "windowspecdefinition(__pid" in p and "SinglePartition" not in p


def test_epoch_shuffle_deterministic_permutations(spark, sf_dir):
    from gpu_telemetry_lakehouse_spark.operators.shard import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    e1 = epoch_shuffle(docs, "doc_id", epoch=1)
    e1b = epoch_shuffle(docs, "doc_id", epoch=1)
    e2 = epoch_shuffle(docs, "doc_id", epoch=2)
    n = docs.count()
    # dense positions, full coverage
    assert sorted(r.position for r in e1.collect()) == list(range(n))
    # same epoch -> identical permutation (retry/speculation-safe)
    assert e1.exceptAll(e1b).count() == 0
    # different epoch -> different permutation of the same rows
    both = e1.withColumnRenamed("position", "p1").join(
        e2.withColumnRenamed("position", "p2"), "doc_id"
    )
    assert both.count() == n
    assert both.filter(F.col("p1") != F.col("p2")).count() > n // 2


def test_gold_job_efficiency_bucketed_join_matches_broadcast(
    spark, sf_dir, monkeypatch
):
    """The size-gated join strategy in gold_job_efficiency_daily (the r9
    sf100 run killed the hard-pinned broadcast: jobs is a projection of
    orders and GROWS with the fact side) must be a pure physical choice —
    the day-bucketed shuffle plan's output is BIT-identical to the
    broadcast plan's (the sample aggregate is an integer sum over scaled
    longs, order-insensitive by construction)."""
    from gpu_telemetry_lakehouse_spark.queries import telemetry_gold as TG

    base = TG.gold_job_efficiency_daily(spark, sf_dir)
    assert "BroadcastHashJoin" in plan_of(base)
    broadcast_rows = sorted(map(tuple, base.collect()))

    monkeypatch.setattr(TG, "_BROADCAST_JOBS_MAX", 0)
    bucketed = TG.gold_job_efficiency_daily(spark, sf_dir)
    bucketed_rows = sorted(map(tuple, bucketed.collect()))
    assert bucketed_rows == broadcast_rows  # bit-exact, floats included

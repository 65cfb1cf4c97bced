"""Streaming replay == batch result; watermark + foreachBatch alerting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpu_telemetry_lakehouse_spark.catalog import load_table
from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
    alert_on_bursts,
    hourly_agg,
    incremental_hourly_gold,
    read_event_stream,
    run_to_memory,
)


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir, tmp_path_factory):
    """Events split into time-ordered files with strictly increasing mtimes.

    The file stream source orders files by modification time; one parquet job
    writes all parts within milliseconds, so replay order would be arbitrary
    and an out-of-order file makes every earlier file late-beyond-watermark.
    Copying the range-partitioned parts in ts order with spaced mtimes gives a
    Kafka-like replay: ordered across batches, unordered within a batch."""
    import os
    import shutil
    import time

    stage = tmp_path_factory.mktemp("replay_stage")
    d = tmp_path_factory.mktemp("replay")
    ev = load_table(spark, sf_dir, "events")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(str(stage))
    # part index == ascending ts range for repartitionByRange output
    parts = sorted(p for p in os.listdir(str(stage)) if p.startswith("part-"))
    base = time.time() - 100 * len(parts)
    for i, name in enumerate(parts):
        tgt = os.path.join(str(d), name)
        shutil.copy(os.path.join(str(stage), name), tgt)
        os.utime(tgt, (base + 100 * i, base + 100 * i))
    return str(d)


def test_stream_equals_batch(spark, sf_dir, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    q, result = run_to_memory(incremental_hourly_gold(stream), spark, name="t_hourly")
    try:
        got = {
            (r.hour_start, r.event_type): (r.n, r.sum_value) for r in result.collect()
        }
    finally:
        q.stop()
    batch = hourly_agg(load_table(spark, sf_dir, "events"))
    want = {
        (r.hour_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == want  # incremental == batch, bit-for-bit


def test_burst_alerts(spark, replay_dir):
    alerts: list = []
    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    q = alert_on_bursts(stream, threshold=2, sink=alerts, spark=spark)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert alerts, "expected at least one hourly bucket above threshold"
    assert all(n > 2 for (_, _, _, n) in alerts)


def test_stream_sessions_equal_batch(spark, sf_dir, replay_dir):
    from gpu_telemetry_lakehouse_spark.queries import QUERIES
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        incremental_sessions,
        session_agg,
    )

    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    q, result = run_to_memory(incremental_sessions(stream), spark, name="t_sessions")
    try:
        got = {(r.user_id, r.session_start, r.n_events) for r in result.collect()}
    finally:
        q.stop()

    # twin 1: the same transform on the batch frame
    batch = session_agg(load_table(spark, sf_dir, "events"))
    want = {(r.user_id, r.session_start, r.n_events) for r in batch.collect()}
    assert got == want

    # twin 2: the oracle-matched gaps-and-islands query agrees on
    # (user, start, size) — independent formulation, same sessions
    gi = QUERIES["session_windows_users"](spark, sf_dir)
    want2 = {(r.user_id, r.session_start, r.n_events) for r in gi.collect()}
    assert got == want2


def test_sliding_stream_equals_batch(spark, sf_dir, replay_dir):
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        incremental_sliding,
        sliding_value_rate,
    )

    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    q, result = run_to_memory(incremental_sliding(stream), spark, name="t_sliding")
    try:
        got = {
            (r.win_start, r.event_type): (r.n, r.sum_value) for r in result.collect()
        }
    finally:
        q.stop()
    batch = sliding_value_rate(load_table(spark, sf_dir, "events"))
    want = {
        (r.win_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == want
    # sliding windows overlap: strictly more buckets than the tumbling rollup
    assert len(got) > hourly_agg(load_table(spark, sf_dir, "events")).count()


def test_stream_static_enrichment_equals_batch(spark, sf_dir, replay_dir):
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        enriched_segment_hourly,
    )

    dim = load_table(spark, sf_dir, "customer")
    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    q, result = run_to_memory(
        enriched_segment_hourly(stream.withWatermark("ts", "2 hours"), dim),
        spark,
        name="t_enriched",
    )
    try:
        got = {(r.hour_start, r.c_mktsegment): r.n for r in result.collect()}
    finally:
        q.stop()
    batch = enriched_segment_hourly(load_table(spark, sf_dir, "events"), dim)
    want = {(r.hour_start, r.c_mktsegment): r.n for r in batch.collect()}
    assert got and got == want


def test_stateful_running_totals(spark, sf_dir, replay_dir):
    """applyInPandasWithState: final per-user state equals the batch ground
    truth; update mode emits one row per (user, batch-it-appeared-in)."""
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        running_user_totals,
    )

    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    emitted: list = []

    def collect_batch(batch_df, epoch_id):
        emitted.extend(
            (epoch_id, r.user_id, r.n_events, r.sum_value, r.last_ts_us)
            for r in batch_df.collect()
        )

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(collect_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # last emission per user == running total after the final batch
    final: dict = {}
    for epoch, uid, n, sv, last_us in sorted(emitted):
        final[uid] = (n, sv, last_us)

    # ground truth via pandas (same numpy rounding as the stateful fn)
    pdf = load_table(spark, sf_dir, "events").select("user_id", "ts", "value").toPandas()
    g = pdf.groupby("user_id")
    want = {
        int(uid): (
            int(len(grp)),
            float(grp["value"].mul(1_000_000).round().sum() / 1e6),
            int(grp["ts"].astype("int64").max() // 1_000),
        )
        for uid, grp in g
    }
    assert final == want
    # state accumulated across multiple micro-batches for at least some users
    multi = {u for (_, u, *_r) in emitted}
    assert len(emitted) > len(multi), "expected users updated in >1 batch"


def test_streaming_dedup_removes_redelivered(spark, sf_dir, tmp_path):
    """At-least-once redelivery (every row delivered twice, across different
    files/micro-batches) -> dropDuplicatesWithinWatermark emits each
    event_id exactly once and the output matches the batch distinct."""
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import dedup_events_stream

    ev = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "dup_replay")
    ev.repartitionByRange(3, "ts").write.mode("overwrite").parquet(d)
    ev.repartition(2).write.mode("append").parquet(d)

    stream = read_event_stream(spark, d, max_files_per_trigger=2)
    emitted: list = []

    def collect_batch(batch_df, epoch_id):
        emitted.extend(r.event_id for r in batch_df.select("event_id").collect())

    # wide watermark: files replay out of time-order, so a tight watermark
    # would drop first arrivals as late (separately tested above); here we
    # isolate the dedup semantics
    q = (
        dedup_events_stream(stream, watermark="3650 days")
        .writeStream.outputMode("append")
        .foreachBatch(collect_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {r.event_id for r in ev.select("event_id").collect()}
    assert len(emitted) == len(set(emitted)), "an event_id was emitted twice"
    assert set(emitted) == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode + watermark: a row later than the watermark for an
    already-finalized window is dropped, not retro-applied."""
    import datetime as dt

    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        EVENTS_STREAM_SCHEMA,
        incremental_hourly_gold,
    )

    def ev(event_id, hour, minute=0, value=1.0):
        return (
            event_id,
            dt.datetime(2024, 1, 1, hour, minute),
            1,
            "telemetry",
            value,
            "{}",
        )

    d = str(tmp_path / "late_src")
    # phase 1: hours 1..5 -> watermark advances to 03:00 (max 05:00 - 2h)
    spark.createDataFrame(
        [ev(i, h) for i, h in enumerate([1, 2, 3, 4, 5])], EVENTS_STREAM_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)

    emitted: list = []

    agg = incremental_hourly_gold(
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )

    def collect_batch(batch_df, epoch_id):
        emitted.extend(
            (r.hour_start, r.event_type, r.n, r.sum_value) for r in batch_df.collect()
        )

    q = agg.writeStream.outputMode("append").foreachBatch(collect_batch).start()
    try:
        q.processAllAvailable()
        # phase 2: one LATE row for hour 1 (behind watermark -> dropped) and
        # one fresh row at hour 10 (advances watermark, finalizing the rest)
        spark.createDataFrame(
            [ev(100, 1, 30, 99.0), ev(101, 10)], EVENTS_STREAM_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()

    by_hour = {h.hour: (n, sv) for (h, _t, n, sv) in emitted}
    # hour 1 finalized with ONLY the phase-1 row; the late 99.0 never lands
    assert by_hour[1] == (1, 1.0)
    # no window was emitted twice
    hours = [h.hour for (h, _t, _n, _sv) in emitted]
    assert len(hours) == len(set(hours))


def test_checkpoint_restart_exactly_once(spark, sf_dir, replay_dir, tmp_path):
    """Kill the checkpointed parquet-sink query mid-replay, restart it from
    the same checkpoint against the grown source: finalized windows must be
    emitted exactly once and match the batch rollup (no loss from skipped
    offsets, no duplicates from reprocessing)."""
    import os
    import shutil

    from gpu_telemetry_lakehouse_spark.streaming.pipeline import run_to_parquet

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    parts = sorted(p for p in os.listdir(replay_dir) if p.startswith("part-"))

    def run_once() -> None:
        stream = read_event_stream(spark, str(src))
        q = run_to_parquet(incremental_hourly_gold(stream), str(out), str(ckpt))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # first run sees half the files, then the query is stopped ("crash")
    for name in parts[:2]:
        shutil.copy(os.path.join(replay_dir, name), src / name)
    run_once()
    # source grows while the query is down; restart from the same checkpoint
    for name in parts[2:]:
        shutil.copy(os.path.join(replay_dir, name), src / name)
    run_once()

    got = {
        (r.hour_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(str(out)).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.hour_start, r.event_type): (r.n, r.sum_value)
        for r in hourly_agg(ev).collect()
    }
    # append mode emits only watermark-finalized windows; everything emitted
    # must match batch exactly, and no key may appear twice in the sink
    sink_rows = spark.read.parquet(str(out)).count()
    assert sink_rows == len(got), "duplicate window emitted across restart"
    assert got, "no windows finalized"
    assert all(got[k] == want[k] for k in got)
    # coverage: every batch window finalized well before the end of the
    # replay (watermark = max ts - 2h) must have been emitted
    from datetime import timedelta

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - timedelta(hours=3)
    missing = [k for k in want if k not in got and k[0] < horizon]
    assert not missing, f"finalized windows lost across restart: {missing[:3]}"


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, replay_dir):
    """The watermarked stream-stream interval join must emit exactly the
    batch join's pairs across a multi-batch replay (append mode: each pair
    exactly once)."""
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import clicks_before_errors

    stream = read_event_stream(spark, replay_dir)
    s_clicks = stream.filter(F.col("event_type") == "click")
    s_errors = stream.filter(F.col("event_type") == "error")
    joined = clicks_before_errors(s_clicks, s_errors)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ss_join")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.error_id, r.click_id)
            for r in spark.table("t_ss_join").collect()
        )
    finally:
        q.stop()

    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        (r.user_id, r.error_id, r.click_id)
        for r in clicks_before_errors(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "error"),
        ).collect()
    )
    assert len(want) > 0
    assert got == want


def test_stateful_sessions_with_event_time_timeout(spark, sf_dir, replay_dir):
    """Custom-state sessionization: every session the watermark could close
    must emit exactly once with exact (start, end, count); nothing else may
    emit."""
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        user_sessions_stateful,
    )

    GAP_MIN = 30
    stream = read_event_stream(spark, replay_dir)
    q = (
        user_sessions_stateful(stream, gap_minutes=GAP_MIN)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_state_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start, r.session_end): r.n_events
            for r in spark.table("t_state_sessions").collect()
        }
    finally:
        q.stop()

    # batch truth: gaps-and-islands per user in pandas (testdata is small)
    import pandas as pd
    from datetime import timedelta

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").toPandas()
    want = {}
    for uid, g in ev.sort_values("ts").groupby("user_id"):
        ts = list(g["ts"])
        s = last = ts[0]
        n = 1
        for t in ts[1:]:
            if (t - last).total_seconds() > GAP_MIN * 60:
                want[(uid, s, last)] = n
                s, last, n = t, t, 1
            else:
                last, n = t, n + 1
        want[(uid, s, last)] = n  # trailing open session

    # horizon: a session surely closes once watermark (max_ts - 2h) passes
    # session_end + gap
    max_ts = ev["ts"].max()
    horizon = max_ts - timedelta(hours=2, minutes=GAP_MIN + 5)
    must_emit = {k: v for k, v in want.items() if k[2] < horizon}

    for k in got:
        assert k in want, f"emitted session not in batch truth: {k}"
        assert got[k] == want[k], (k, got[k], want[k])
    missing = [k for k in must_emit if k not in got]
    assert not missing, f"closed sessions never emitted: {missing[:3]}"
    assert len(got) >= len(must_emit) > 0


def test_transform_with_state_matches_legacy(spark, sf_dir, replay_dir):
    """transformWithStateInPandas (RocksDB state store) produces the same
    final per-user totals as the applyInPandasWithState operator and the
    batch ground truth. Skips where protobuf (a TWS runtime dependency this
    container lacks) is unavailable — the operator itself is import-clean."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas requires protobuf at runtime",
    )
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        running_user_totals_tws,
    )

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    emitted: list = []

    def collect_batch(batch_df, epoch_id):
        emitted.extend(
            (epoch_id, r.user_id, r.n_events, r.sum_value, r.last_ts_us)
            for r in batch_df.collect()
        )

    try:
        stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
        q = (
            running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .foreachBatch(collect_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    final: dict = {}
    for _, uid, n, sv, last_us in sorted(emitted):
        final[uid] = (n, round(sv, 6), last_us)

    import pandas as pd

    ev = pd.read_parquet(f"{replay_dir}")
    g = ev.groupby("user_id")
    want = {
        int(uid): (
            int(len(grp)),
            round(int(grp["value"].mul(1_000_000).round().sum()) / 1e6, 6),
            int((grp["ts"].astype("int64") // 1_000).max()),
        )
        for uid, grp in g
    }
    assert final == want


def test_stream_stream_left_outer_join(spark, sf_dir, replay_dir):
    """Left-outer stream-stream interval join == its batch twin: every error
    appears; errors without a preceding click carry NULL click columns."""
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        errors_with_optional_click,
        read_event_stream,
    )

    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    clicks_s = stream.filter(F.col("event_type") == "click")
    errors_s = stream.filter(F.col("event_type") == "error")
    q = (
        errors_with_optional_click(clicks_s, errors_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_outer_join")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.error_id, r.click_id)
            for r in spark.table("t_outer_join").collect()
        }
    finally:
        q.stop()

    ev = load_table(spark, sf_dir, "events")
    batch = errors_with_optional_click(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
    )
    want = {(r.user_id, r.error_id, r.click_id) for r in batch.collect()}
    # The stream result may lag only by watermark-held NULL rows at stream
    # end; matched rows must agree exactly and stream ⊆ batch.
    assert got
    assert got <= want
    matched_got = {t for t in got if t[2] is not None}
    matched_want = {t for t in want if t[2] is not None}
    assert matched_got == matched_want


def test_stream_maintained_gold_table_equals_batch(spark, tmp_path):
    """The reference's full streaming-simulation future work (README.md:
    574-584) end to end: the custom telemetry_replay connector streamed
    through an ADDITIVE gold maintenance loop — each micro-batch's partial
    (count, exact scaled sum) folds into the tablog table via an idempotent
    batch_id MERGE — must land byte-identical to the one-shot batch rollup
    of the same feed. Additivity keeps arithmetic exact (integer tenths, no
    float re-ordering) and the pattern scales: per-epoch work is O(touched
    hours), the history table is never re-scanned."""
    from gpu_telemetry_lakehouse_spark import tablog as T
    from gpu_telemetry_lakehouse_spark.streaming import replay_source as R

    R.register(spark)
    tbl = str(tmp_path / "gold_hourly_stream")
    ck = str(tmp_path / "ck")
    opts = {"machines": "4", "ticks": "7"}

    def partial(df):
        return df.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.round(F.col("gpu_util") * 10).cast("long")).alias(
                "sum_gpu_tenths"
            ),
        )

    def apply_batch(bdf, epoch_id):
        # EVERY epoch goes through the batch_id-guarded MERGE — the table
        # was created empty before the stream started, so there is no
        # unguarded create path whose replay (restart between create and
        # checkpoint commit) would double-count epoch 0's partials.
        base = T.read(bdf.sparkSession, tbl)
        upd = (
            partial(bdf)
            .alias("u")
            .join(base.alias("b"), "hr", "full_outer")
            .select(
                "hr",
                (
                    F.coalesce(F.col("u.n_samples"), F.lit(0))
                    + F.coalesce(F.col("b.n_samples"), F.lit(0))
                ).alias("n_samples"),
                (
                    F.coalesce(F.col("u.sum_gpu_tenths"), F.lit(0))
                    + F.coalesce(F.col("b.sum_gpu_tenths"), F.lit(0))
                ).alias("sum_gpu_tenths"),
            )
        )
        T.merge_upsert(
            bdf.sparkSession, upd, tbl, key_cols=["hr"], batch_id=int(epoch_id)
        )

    stream = (
        spark.readStream.format("telemetry_replay").options(**opts).load()
    )
    # Version 0: the empty table (schema only) — idempotency holds from the
    # very first epoch.
    empty = partial(
        spark.read.format("telemetry_replay").options(**opts).load()
    ).limit(0)
    T.create_table(empty, tbl)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(T.read(spark, tbl).collect())
    want = sorted(
        partial(spark.read.format("telemetry_replay").options(**opts).load()).collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and got
    ops = [h["operation"] for h in T.history(tbl)]
    assert ops[0] == "create" and set(ops[1:]) <= {"merge"}
    # Replayed epoch is a no-op: re-apply an already-committed batch id with
    # the FULL feed as its (wrong, worst-case) payload — the ledger rejects
    # it and the table is unchanged.
    replay_id = max(T.committed_batch_ids(tbl))
    apply_batch(spark.read.format("telemetry_replay").options(**opts).load(), replay_id)
    assert sorted(T.read(spark, tbl).collect()) == got


def test_stateful_transitions_equal_batch(spark, sf_dir, replay_dir):
    """The stateful cross-batch transition emitter must reproduce the batch
    lag() transition multiset exactly (order-preserving state stitching)."""
    from collections import Counter

    from gpu_telemetry_lakehouse_spark.queries.timeseries import (
        event_transition_matrix,
    )
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        read_event_stream,
        user_transitions_stream,
    )

    stream = read_event_stream(spark, replay_dir, max_files_per_trigger=2)
    emitted: Counter = Counter()

    def collect_batch(batch_df, epoch_id):
        for r in batch_df.collect():
            emitted[(r.from_type, r.to_type)] += 1

    q = (
        user_transitions_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(collect_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {
        (r.from_type, r.to_type): r.n
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    assert dict(emitted) == want


def test_streaming_neardup_maintenance_equals_batch(spark, sf_dir, tmp_path):
    """Online near-dup detection: documents arrive as a file stream; each
    micro-batch signs itself, band-joins only its delta against the standing
    tablog signature table (minhash_maintain), and emits candidate pairs.
    The union of per-epoch pair sets must equal the one-shot
    minhash_lsh_pairs recompute over the whole corpus — the streaming path
    loses nothing versus batch dedup."""
    from gpu_telemetry_lakehouse_spark.catalog import load_table
    from gpu_telemetry_lakehouse_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_maintain,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feed = str(tmp_path / "feed")
    for i in range(3):  # three arrival chunks -> three+ micro-batches
        docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    sig_tbl = str(tmp_path / "sigs")
    got: dict = {}

    def on_batch(bdf, epoch_id):
        if bdf.isEmpty():
            return
        pairs = minhash_maintain(
            bdf.sparkSession, sig_tbl, bdf, batch_id=int(epoch_id)
        )
        for r in pairs.collect():
            got[(r.id_a, r.id_b)] = r.est_jaccard

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(minhash_signatures(docs)).collect()
    }
    assert got == full and got

    # replayed epoch: ledger skips the double-append, pair output unchanged
    from gpu_telemetry_lakehouse_spark import tablog as T

    n_versions = len(T.history(sig_tbl))
    replay_id = max(T.committed_batch_ids(sig_tbl))
    chunk = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 2)
    again = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_maintain(
            spark, sig_tbl, chunk, batch_id=replay_id
        ).collect()
    }
    assert len(T.history(sig_tbl)) == n_versions  # no new commit
    assert set(again) <= set(full)


# --- round-9 degenerate class: out-of-order / duplicate event-time replay ----
# VERDICT r8 #4: disorder and redelivery are the streaming facts of life the
# in-order replay_dir never exercises. Files below replay NEWEST-FIRST (every
# subsequent file is "late" relative to the max event time already seen), so
# correctness is entirely the watermark contract's job.


@pytest.fixture(scope="module")
def reverse_replay_dir(spark, sf_dir, tmp_path_factory):
    """Events split into ts-ranged files replayed in REVERSE time order."""
    import os
    import shutil
    import time

    stage = tmp_path_factory.mktemp("rev_stage")
    d = tmp_path_factory.mktemp("rev_replay")
    ev = load_table(spark, sf_dir, "events")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(str(stage))
    parts = sorted(p for p in os.listdir(str(stage)) if p.startswith("part-"))
    base = time.time() - 100 * len(parts)
    for i, name in enumerate(reversed(parts)):  # newest ts range first
        tgt = os.path.join(str(d), name)
        shutil.copy(os.path.join(str(stage), name), tgt)
        os.utime(tgt, (base + 100 * i, base + 100 * i))
    return str(d)


def test_disordered_replay_hourly_parity(spark, sf_dir, reverse_replay_dir):
    """stream == batch under full disorder when the watermark absorbs it:
    a lateness horizon wider than the replay's time span means no row is
    ever dropped as late, so the final rollup must be bit-identical to the
    batch twin even though every file after the first arrives 'late'."""
    stream = read_event_stream(spark, reverse_replay_dir)
    q, result = run_to_memory(
        incremental_hourly_gold(stream, watermark="3650 days"),
        spark,
        name="t_rev_hourly",
    )
    try:
        got = {
            (r.hour_start, r.event_type): (r.n, r.sum_value) for r in result.collect()
        }
    finally:
        q.stop()
    batch = hourly_agg(load_table(spark, sf_dir, "events"))
    want = {
        (r.hour_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == want


def test_disordered_replay_sessions_parity(spark, sf_dir, reverse_replay_dir):
    """Built-in session windows under reverse replay + absorbing watermark:
    session merging must reassemble the same sessions the batch twin finds
    no matter the arrival order."""
    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        incremental_sessions,
        session_agg,
    )

    stream = read_event_stream(spark, reverse_replay_dir, max_files_per_trigger=2)
    q, result = run_to_memory(
        incremental_sessions(stream, watermark="3650 days"), spark, name="t_rev_sess"
    )
    try:
        got = {(r.user_id, r.session_start, r.n_events) for r in result.collect()}
    finally:
        q.stop()
    batch = session_agg(load_table(spark, sf_dir, "events"))
    want = {(r.user_id, r.session_start, r.n_events) for r in batch.collect()}
    assert got == want


def test_stateful_sessions_disorder_and_late_rows(spark, tmp_path):
    """The r9 disorder defect, pinned: an out-of-order row INSIDE the
    watermark must land in (or create) its true session — the old
    single-(start,last,n) state regressed ``last`` backward and emitted a
    garbage start>end session — while a row BEHIND the watermark is dropped
    and resurrects nothing. Duplicate event-times count, never merge."""
    import datetime as dt

    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        EVENTS_STREAM_SCHEMA,
        user_sessions_stateful,
    )

    def ev(event_id, hh, mm, uid=1):
        return (
            event_id,
            dt.datetime(2024, 1, 1, hh, mm),
            uid,
            "telemetry",
            1.0,
            "{}",
        )

    d = str(tmp_path / "disorder_src")
    emitted: list = []

    def collect_batch(batch_df, epoch_id):
        emitted.extend(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in batch_df.collect()
        )

    # phase 1: u1 02:00 + DUPLICATE event-times at 02:10 (distinct ids)
    spark.createDataFrame(
        [ev(1, 2, 0), ev(2, 2, 10), ev(3, 2, 10)], EVENTS_STREAM_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        user_sessions_stateful(stream, gap_minutes=30, watermark="2 hours")
        .writeStream.outputMode("append")
        .foreachBatch(collect_batch)
        .start()
    )
    try:
        q.processAllAvailable()
        # phase 2: u1 01:00 arrives OUT OF ORDER (watermark is 00:10 — the
        # row is legal) and forms its own earlier session; u2 08:00 advances
        # the watermark to 06:00, closing both u1 sessions
        spark.createDataFrame(
            [ev(4, 1, 0), ev(5, 8, 0, uid=2)], EVENTS_STREAM_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        # phase 3: u1 01:05 is LATE (behind the 06:00 watermark) — dropped,
        # no session resurrected; u2 09:00 keeps u2's session open
        spark.createDataFrame(
            [ev(6, 1, 5), ev(7, 9, 0, uid=2)], EVENTS_STREAM_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()

    by_user: dict = {}
    for uid, s, e, n in emitted:
        by_user.setdefault(uid, []).append((s.isoformat(), e.isoformat(), n))
    # u1: exactly the two true sessions, each emitted once, start <= end
    assert sorted(by_user.get(1, [])) == [
        ("2024-01-01T01:00:00", "2024-01-01T01:00:00", 1),
        ("2024-01-01T02:00:00", "2024-01-01T02:10:00", 3),
    ], by_user
    # u2's trailing session never closed -> never emitted
    assert 2 not in by_user, by_user


def test_stateful_sessions_boundary_row_at_watermark(spark, tmp_path):
    """Watermark-boundary contract (review r9): (1) an admissible row above
    the watermark but within gap of a pending session MERGES — no spurious
    session split; (2) a row at EXACTLY t == watermark is dropped by
    Spark\'s operator-level late filter before reaching the state function
    (this is the upstream boundary that made the pre-fix emit-at-equality
    unreachable-by-race; the emit rule is now strict so the function stays
    self-consistent either way) and resurrects/creates nothing; (3) the
    session still emits exactly once."""
    import datetime as dt

    from gpu_telemetry_lakehouse_spark.streaming.pipeline import (
        EVENTS_STREAM_SCHEMA,
        user_sessions_stateful,
    )

    def ev(event_id, hh, mm, uid=1):
        return (
            event_id,
            dt.datetime(2024, 1, 1, hh, mm),
            uid,
            "telemetry",
            1.0,
            "{}",
        )

    d = str(tmp_path / "boundary_src")
    emitted: list = []

    def collect_batch(batch_df, epoch_id):
        emitted.extend(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in batch_df.collect()
        )

    # phase 1: u1 02:00+02:10 (gap 30m => extendable until 02:40); u2 04:35
    # drives the watermark to 02:35 after this batch
    spark.createDataFrame(
        [ev(1, 2, 0), ev(2, 2, 10), ev(3, 4, 35, uid=2)], EVENTS_STREAM_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        user_sessions_stateful(stream, gap_minutes=30, watermark="2 hours")
        .writeStream.outputMode("append")
        .foreachBatch(collect_batch)
        .start()
    )
    try:
        q.processAllAvailable()
        # phase 2: u1 02:39 — above wm (02:35), within gap of 02:10 —
        # must EXTEND the pending session, not start a second one
        spark.createDataFrame([ev(4, 2, 39)], EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(d)
        q.processAllAvailable()
        # phase 3: u1 at EXACTLY t == wm == 02:35 — dropped upstream,
        # changes nothing (neither count nor end)
        spark.createDataFrame([ev(5, 2, 35)], EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(d)
        q.processAllAvailable()
        # phases 4+5: u2 10:00 pushes wm to 08:00; one more batch fires the
        # event-time timeout that closes every pending u1 session
        spark.createDataFrame(
            [ev(6, 10, 0, uid=2)], EVENTS_STREAM_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
        spark.createDataFrame(
            [ev(7, 10, 0, uid=3)], EVENTS_STREAM_SCHEMA
        ).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()

    u1 = sorted(
        (s.isoformat(), e.isoformat(), n)
        for uid, s, e, n in emitted
        if uid == 1
    )
    assert u1 == [("2024-01-01T02:00:00", "2024-01-01T02:39:00", 3)], emitted

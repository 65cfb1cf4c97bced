"""Streaming telemetry pipeline: file-source replay -> watermarked windowed
aggregation -> incremental gold; foreachBatch alerting.

reference: README.md:574-584 names exactly this as future work ("replay
script that pushes events into Kafka…", "alerting"). Spark-first: the SAME
transform function serves batch and stream (queries/stream_batch.py calls
``hourly_agg`` on a batch frame; here it runs incrementally with late-data
handling via watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

# events table schema with ts already converted to TimestampType
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_agg(df: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type — shared batch/stream transform.

    Decimal-staged sum keeps the double deterministic (and oracle-matched in
    the batch twin).
    """
    return (
        df.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")) / 1e6).alias("sum_value"),
        )
        .select(F.col("win.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of telemetry parquet (the Kafka stand-in; swap
    ``format('kafka')`` in production — the downstream plan is identical)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def incremental_hourly_gold(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked incremental hourly rollup (late rows beyond the watermark
    are dropped deterministically; state is bounded for infinite streams)."""
    return hourly_agg(stream.withWatermark("ts", watermark))


def run_to_memory(
    agg: DataFrame, spark: SparkSession, name: str = "hourly_gold"
) -> tuple[StreamingQuery, DataFrame]:
    """Drive a bounded replay to completion into an in-memory sink (tests /
    local verification; production uses a parquet/Delta sink + checkpoint)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q, agg.sparkSession.table(name)


def session_agg(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (inactivity gap): the streaming twin of the
    batch gaps-and-islands query ``session_windows_users``. Works on both
    batch and streaming frames; streaming requires a watermark upstream.

    session_window merges rows closer than ``gap``; its ``start`` equals the
    batch twin's MIN(ts) per island, so the two agree on
    (user_id, session_start, n_events)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("win.start").alias("session_start"), "n_events"
        )
    )


def incremental_sessions(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return session_agg(stream.withWatermark("ts", watermark))


def sliding_value_rate(df: DataFrame, length: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window rate per event_type (each event lands in length/slide
    overlapping windows). Shared batch/stream transform, like ``hourly_agg``."""
    return (
        df.groupBy(F.window("ts", length, slide).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")) / 1e6).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def incremental_sliding(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return sliding_value_rate(stream.withWatermark("ts", watermark))


def enriched_segment_hourly(stream: DataFrame, customer_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each micro-batch
    broadcast-joins the (small, slowly-changing) customer dimension — no
    stream-side state, so this scales to unbounded input; only the dimension
    must fit in executor memory."""
    dim = F.broadcast(customer_dim.select("c_custkey", "c_mktsegment"))
    return (
        stream.join(dim, F.col("user_id") == F.col("c_custkey"), "inner")
        .groupBy(F.window("ts", "1 hour").alias("win"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("hour_start"), "c_mktsegment", "n")
    )


# --- custom stateful operator: applyInPandasWithState ------------------------

RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_scaled", T.LongType()),  # value * 1e6 as exact long
        T.StructField("last_ts_us", T.LongType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (SURVEY.md §2.2 streaming row): arbitrary
    per-key state that windowed aggregation can't express — exact running
    totals emitted continuously, not per-window. The batch twin is a plain
    groupBy; the streaming form keeps one tiny state row per user.

    The state fn is a local closure, not a module-level def, so cloudpickle
    ships it by value — workers need no importable copy of this package
    (driver contract: the external harness may run from any cwd)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def running_totals_fn(key, pdf_iter, state):
        # Per-user running (count, exact sum, max event time); emits the
        # updated totals once per micro-batch the user appears in. State is
        # three longs — bounded and Arrow-cheap — so 10^9 users is ~24 GB of
        # state cluster-wide, spread across executors by the groupBy hash.
        import pandas as pd

        n, s, last = state.get if state.exists else (0, 0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += int(pdf["value"].mul(1_000_000).round().sum())
            ts_us = (pdf["ts"].astype("int64") // 1_000).max()
            last = max(last, int(ts_us))
        state.update((n, s, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s / 1e6],
                "last_ts_us": [last],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        running_totals_fn,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: at-least-once sources (Kafka, file replay)
    redeliver rows; keep the first arrival per ``event_id``.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state — keys whose
    event time falls behind the watermark are evicted, so state size tracks
    the redelivery horizon (watermark window), not the full stream history.
    Plain ``dropDuplicates`` on a stream retains every key forever and OOMs
    on unbounded input; this is the 100 TB-safe form. Batch twin:
    ``dedup_exact_summary`` / ``dropDuplicates`` (queries/dedup.py)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def clicks_before_errors(
    clicks: DataFrame,
    errors: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: for each error, the same user's clicks in
    the preceding ``lookback`` window (the "what led up to the failure"
    query, run continuously).

    The canonical bounded-state shape Spark REQUIRES for stream-stream
    joins: watermarks on both sides plus a time-range condition tying the
    two event times. The range bound lets the engine evict buffered clicks
    older than error-watermark − lookback and errors older than the click
    watermark — state tracks the lookback horizon, not stream history. An
    equi-join without the range condition is rejected by the planner on
    streams precisely because its state is unbounded.

    Works identically on batch frames (watermarks become no-ops), which is
    how tests pin stream==batch equality.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    ).withWatermark("error_ts", watermark)
    return c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    ).select(
        F.col("e_user").alias("user_id"), "error_id", "error_ts", "click_id", "click_ts"
    )


# Pending (not-yet-watermark-closed) sessions, parallel arrays sorted by
# start. A LIST is required for disorder-correct sessionization: with one
# (start, last, n) row, a cross-batch out-of-order row (legal while inside
# the watermark) regressed ``last`` backward and mis-split later sessions —
# the r9 disorder corpus surfaced it. Size is bounded by watermark/gap
# (pending sessions per key inside the lateness horizon), the same state
# bound the built-in session_window keeps internally.
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("lasts", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def user_sessions_stateful(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom sessionization with event-time TIMEOUTS: each closed session
    emits exactly once, as (user, start, end, n), the moment the watermark
    proves no more events can extend it.

    ``session_window`` (incremental_sessions) covers the built-in case; this
    is the arbitrary-state form a pipeline needs when sessions carry custom
    payloads or close on custom rules. Mechanics (disorder-correct, r9): per
    user the state is the PENDING interval list [(start, last, n)] sorted by
    start. Each batch's rows — minus rows at/behind the current watermark,
    which could otherwise resurrect an already-emitted session — gap-merge
    into that list (an out-of-order row inside the watermark lands in, or
    bridges, whichever pending sessions it belongs to; nothing regresses).
    A session emits EXACTLY ONCE, the moment the watermark passes
    ``last + gap`` — the point the protocol proves no row can still extend
    it; ``setTimeoutTimestamp`` arms the earliest pending close so idle keys
    emit via ``hasTimedOut``. State per key is O(pending sessions inside the
    lateness horizon) — bounded by watermark/gap, the same eviction contract
    as the windowed operators.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        wm_us = state.getCurrentWatermarkMs() * 1_000
        pend: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            pend = [[starts[i], lasts[i], ns[i]] for i in range(len(starts))]
        new_ts: list[int] = []
        if not state.hasTimedOut:
            for p in pdfs:
                if len(p):
                    new_ts += (p["ts"].astype("int64") // 1_000).tolist()
            # the late-row rule: a row at/behind the watermark is dropped
            # (it could only extend a session the watermark already closed)
            new_ts = [t for t in new_ts if t >= wm_us]
        merged: list[list[int]] = []
        for it in sorted(pend + [[t, t, 1] for t in new_ts]):
            if merged and it[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], it[1])
                merged[-1][2] += it[2]
            else:
                merged.append(it)
        # STRICT close (review r9): the keep rule above admits t >= wm
        # while a session can be extended by any t <= last + gap, so the
        # two rules only PARTITION the boundary point t == wm == last + gap
        # when emission requires wm > last + gap. In practice Spark's own
        # operator-level late filter drops t == wm rows before they reach
        # this function (pinned by the boundary contract test), which made
        # the pre-fix <= unreachable-by-race — but that is an undocumented
        # boundary of an upstream filter; strict emission keeps this
        # function self-consistent whichever way that boundary moves, at
        # the cost of at most one watermark tick of emission latency.
        closed = [iv for iv in merged if iv[1] + gap_us < wm_us]
        still = [iv for iv in merged if iv[1] + gap_us >= wm_us]
        if still:
            state.update(
                (
                    [iv[0] for iv in still],
                    [iv[1] for iv in still],
                    [iv[2] for iv in still],
                )
            )
            alarm_ms = min(iv[1] for iv in still) // 1_000 + gap_minutes * 60 * 1_000
            # the alarm must sit strictly past the current watermark
            state.setTimeoutTimestamp(max(alarm_ms, wm_us // 1_000 + 1))
        elif state.exists:
            state.remove()
        out = pd.DataFrame(
            [(key[0], iv[0], iv[1], iv[2]) for iv in closed],
            columns=["user_id", "start_us", "end_us", "n_events"],
        ).astype("int64")
        yield pd.DataFrame(
            {
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"],
            }
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_parquet(
    agg: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Checkpointed append-mode parquet sink — the production shape of the
    incremental gold pipeline.

    Exactly-once across restarts: source offsets and window state live in the
    checkpoint, and the file sink's commit log records which files belong to
    which epoch, so a query killed mid-batch and restarted from the same
    checkpoint neither loses nor duplicates a window. Append mode emits each
    watermark-finalized window exactly once; the last windows (those the
    watermark never passes on a bounded replay) stay in state, exactly as a
    live deployment holds its open windows.

    The caller drives the query (``processAllAvailable`` for bounded tests,
    ``awaitTermination`` in production)."""
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def alert_on_bursts(
    stream: DataFrame, threshold: int, sink: list, spark: SparkSession
) -> StreamingQuery:
    """foreachBatch alerting (reference: README.md:580-584): any hourly bucket
    whose event count exceeds ``threshold`` is appended to ``sink``."""
    agg = incremental_hourly_gold(stream)
    # Update mode hands each micro-batch only the buckets that CHANGED (in
    # complete mode every epoch re-emits the whole history and the sink grows
    # quadratically on a long replay); the alerted-set dedup makes each hot
    # bucket alert once even as its count keeps climbing past the threshold.
    # The set is driver-local per query start — a restart from checkpoint
    # re-alerts open buckets, the right default for an alerting channel.
    alerted: set = set()

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        hot = batch_df.filter(F.col("n") > threshold).collect()
        for r in hot:
            key = (r.hour_start, r.event_type)
            if key not in alerted:
                alerted.add(key)
                sink.append((epoch_id, r.hour_start, r.event_type, r.n))

    return agg.writeStream.outputMode("update").foreachBatch(emit).start()


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``running_user_totals`` — the
    Spark 4 arbitrary-state API (typed state handles, timers, TTL) that
    replaces applyInPandasWithState. Same semantics: exact per-user running
    (count, scaled-long sum, max event time), one emission per micro-batch a
    user appears in. Requires the RocksDB state store provider (the
    disk-spilling store that makes billions of state keys per executor
    feasible — the HDFS-heap provider keeps all state on-heap) and the
    protobuf package (the TWS state-server wire format; absent from this
    container, so the test import-skips — the operator itself is
    import-clean and runs on any stock Spark 4 cluster).

    The processor class is defined inside this function so cloudpickle ships
    it by value (workers need no importable package copy)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, s BIGINT, last_us BIGINT"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            n, s, last = self._state.get() if self._state.exists() else (0, 0, 0)
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["value"].mul(1_000_000).round().sum())
                ts_us = (pdf["ts"].astype("int64") // 1_000).max()
                last = max(last, int(ts_us))
            self._state.update((n, s, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [s / 1e6],
                    "last_ts_us": [last],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def errors_with_optional_click(
    clicks: DataFrame,
    errors: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every error row survives, with
    NULL click columns when no click preceded it — the variant the inner
    join (clicks_before_errors) cannot express ("which failures had NO
    leading user activity?").

    Outer stream-stream joins add a second constraint beyond the inner
    form's: the NULL-padded result for an unmatched error can only be
    emitted once the click watermark passes the error's join window (before
    that a matching click might still arrive), so outer results trail the
    watermark by design — correctness over latency, deterministically."""
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    ).withWatermark("error_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    return e.join(
        c,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {lookback}")),
        "left_outer",
    ).select(
        F.col("e_user").alias("user_id"), "error_id", "error_ts", "click_id", "click_ts"
    )


def user_transitions_stream(stream: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``event_transition_matrix``: per user,
    remember the LAST seen event across micro-batches (state = three scalars)
    and emit one row per consecutive-event transition in append mode.

    Within a batch rows are walked in (ts, event_id) order; the stored tail
    event stitches batch N to batch N+1, so as long as the source replays in
    event-time order across batches (Kafka per-key ordering; the file replay
    fixture's mtime spacing) the emitted transition multiset is IDENTICAL to
    the batch lag() derivation — pinned in tests/test_streaming.py. The
    downstream (from, to) cell rollup composes as a normal aggregation on
    the emitted stream or lands in the lake for batch rollup.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        parts = [p for p in pdfs if len(p)]
        out: list[tuple] = []
        if parts:
            batch = pd.concat(parts, ignore_index=True)
            batch = batch.assign(__us=batch["ts"].astype("int64") // 1_000)
            batch = batch.sort_values(["__us", "event_id"], kind="mergesort")
            types = batch["event_type"].tolist()
            us = batch["__us"].tolist()
            ids = batch["event_id"].tolist()
            if state.exists:
                prev_us, prev_id, prev_et = state.get
                out.append((key[0], prev_et, types[0]))
            for i in range(1, len(types)):
                out.append((key[0], types[i - 1], types[i]))
            state.update((us[-1], ids[-1], types[-1]))
        yield pd.DataFrame(out, columns=["user_id", "from_type", "to_type"])

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, from_type string, to_type string",
        stateStructType="ts_us long, event_id long, et string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

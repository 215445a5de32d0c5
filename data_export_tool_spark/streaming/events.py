"""Structured Streaming over the events stream.

The batch twins of these pipelines live in
``data_export_tool_spark.queries.events_q`` (e01 tumbling windows, e03
sessionization) and are oracle-checked there; this module provides the
same semantics as incremental streams:

- ``hourly_counts_stream``: watermarked tumbling-window counts — late
  events beyond the watermark are dropped, windows finalize once the
  watermark passes.
- ``sessionize_stream``: gap-based sessions via
  ``applyInPandasWithState`` (custom stateful operator — the Spark
  primitive for operators the built-ins can't express).
- ``funnel_stream``: watermark-buffered funnel progression — the
  stateful twin of ``operators.funnel.funnel_steps`` (buffer until the
  watermark passes, fold in event-time order, emit prefix-exact
  chains).

Scale notes: windowed aggregation state is keyed by (window,
event_type) — bounded by cardinality × retention. Sessionization
state is one open-session record per user; the GroupState timeout
closes idle sessions so state can't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Worker-side functions in this module must travel BY VALUE: executors'
# Python workers don't necessarily have this package on sys.path (the
# host session may run from any cwd). Without this, applyInPandasWithState
# dies with ModuleNotFoundError on any driver that didn't install us.
try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over event parquet drops.

    The driver's events.parquet timestamp annotation varies round-to-
    round (TIMESTAMP(NANOS)/TIMESTAMP/TIMESTAMP_NTZ); the shared
    ``catalog.normalize_event_times`` owns the policy so the stream and
    batch paths can't diverge."""
    from data_export_tool_spark.catalog import normalize_event_times

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # conf values are STRINGS — `not "false"` is False, which would
    # skip the explicit schema exactly when inference is disabled
    infer = (
        str(spark.conf.get("spark.sql.streaming.schemaInference", "false"))
        .lower()
        == "true"
    )
    schema = None
    if not infer:
        try:
            schema = spark.read.parquet(path).schema
        except Exception:
            # directory exists but no drop has landed yet (producer
            # not started): fall back to the module's known layout so
            # the stream can be DEFINED before the first file arrives
            schema = EVENT_SCHEMA
    reader = spark.readStream.format("parquet").option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if schema is not None:
        reader = reader.schema(schema)
    return normalize_event_times(reader.load(path), "ts")


def hourly_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling 1-hour windows per event type — the
    streaming twin of queries.events_q.e01_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_topk_stream(
    events: DataFrame,
    value_col: str = "event_type",
    k: int = 3,
    key_col: str | None = "user_id",
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming windowed EXACT top-k values per key — twin #28, the
    heavy-hitters dashboard row ("this user's top pages this hour"):
    per closed tumbling window and key, the ``k`` most frequent
    ``value_col`` values with counts, rank-exploded.

    TWO chained stateful windowed aggregations (the #20/#21 chassis):
    (window, key, value) counts — the partial aggregation absorbs any
    per-value volume — then a (window, key) fold whose state is the
    key's DISTINCT-VALUE cells. Exactness therefore costs
    alphabet-bounded state per (window, key) — the ``pair_counts``
    contract: correct for enum-grade value columns (event types, page
    ids, status codes); an unbounded-cardinality value column needs
    the stored MG/approx-top-k sketch tier instead, stated here rather
    than discovered in production. Ties break by value string
    ascending (deterministic, replayable). Rows emit once at window
    close (append finality).

    Output: ``(window_start, key?, rank, value, n)`` with rank 1..k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    keys = [key_col] if key_col else []
    base = events.where(
        F.col("ts").isNotNull() & F.col(value_col).isNotNull()
        & (F.col(key_col).isNotNull() if key_col else F.lit(True))
    ).withWatermark("ts", watermark)
    counts = base.groupBy(
        F.window("ts", window).alias("win"),
        *[F.col(c) for c in keys],
        F.col(value_col).cast("string").alias("__v"),
    ).agg(F.count(F.lit(1)).alias("__n"))
    folded = counts.groupBy(F.col("win"), *[F.col(c) for c in keys]).agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct(F.col("__n"), F.col("__v"))),
                lambda a, b: F.when(a["__n"] > b["__n"], -1)
                .when(a["__n"] < b["__n"], 1)
                .when(a["__v"] < b["__v"], -1)
                .when(a["__v"] > b["__v"], 1)
                .otherwise(0),
            ),
            1,
            k,
        ).alias("__top")
    )
    return folded.select(
        F.col("win.start").alias("window_start"),
        *keys,
        F.posexplode(F.col("__top")).alias("__i", "__cell"),
    ).select(
        "window_start",
        *keys,
        (F.col("__i") + 1).alias("rank"),
        F.col("__cell.__v").alias("value"),
        F.col("__cell.__n").alias("n"),
    )


def windowed_distinct_stream(
    events: DataFrame,
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming approximate COUNT DISTINCT per tumbling window and
    event type via the DataSketches HLL aggregate — per-window distinct
    users with FIXED-SIZE state per group, where exact streaming
    distinct would hold every key in state (the 100 TB stream killer).
    The estimate is a deterministic function of the window's item SET
    (HLL insertion is order- and multiplicity-insensitive), so the
    batch twin computing the same expression over the same rows is
    exactly equal — the parity contract STREAMPARITY pins.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.expr(
                f"hll_sketch_estimate(hll_sketch_agg({key_col}))"
            ).alias("n_distinct")
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "n_distinct",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup: drop repeated ``keys`` within the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state for a
    key is freed once the watermark passes its event time, so state
    stays bounded at any stream length; a plain ``dropDuplicates`` on a
    stream would accumulate keys forever).

    The streaming twin of the batch exact-dedup tier
    (operators/dedup.dedup_exact): at-most-once per key within the
    lateness horizon. Duplicates separated by more than the watermark
    can both survive — that's the bounded-state contract at 100 TB/day.
    """
    out = events.withWatermark(time_col, watermark)
    return out.dropDuplicatesWithinWatermark(keys or ["event_id"])


def enrich_stream(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (re-read-per-trigger) static dimension. Stateless — no watermark or
    streaming state involved; Spark broadcasts the dim side when it
    fits ``autoBroadcastJoinThreshold`` (no forced hint: a dimension
    bigger than memory must be able to degrade to a shuffled join
    instead of dying on a forced broadcast).

    The batch twin is the identical ``events.join(dim, on, "left")``;
    the parity test pins stream output == batch output over the same
    files.
    """
    return events.join(dim, on=on, how="left")


def dedup_against_store_stream(
    docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Streaming incremental corpus dedup: drop arriving documents
    whose normalized-content fingerprint already exists in the
    persisted store — the streaming twin of
    ``operators.dedup.dedup_against`` for a continuous ingest feed.

    Structured Streaming does not support stream-static LEFT ANTI, so
    the anti-join is expressed as the equivalent marker left-outer
    join + IS NULL filter (stream-static left outer IS supported; the
    static store re-reads per micro-batch, so a store rolled forward
    between batches applies automatically). Stateless — duplicates
    WITHIN the stream are the separate ``dedup_stream`` watermark
    contract; this operator is the against-history tier."""
    from data_export_tool_spark.operators.dedup import null_safe_fp_key

    marked = store.select(
        F.col(fingerprint_col).alias("__fp")
    ).distinct().withColumn("__seen", F.lit(1))
    return (
        docs.withColumn("__fp", null_safe_fp_key(F.col(text_col)))
        .join(marked, on="__fp", how="left")
        .where(F.col("__seen").isNull())
        .drop("__fp", "__seen")
    )


def enrich_stream_scd2(
    events: DataFrame,
    history: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-static TEMPORAL enrichment: each streaming event picks
    the SCD-2 dimension version valid at its event time — the
    streaming twin of ``operators.upsert.scd2_join`` (same function;
    stream-static joins accept the validity-interval residual because
    the static side is re-read per micro-batch, so a dimension update
    between batches is picked up automatically). Stateless: no
    watermark, no streaming state."""
    from data_export_tool_spark.operators.upsert import scd2_join

    return scd2_join(events, history, keys, ts_col=ts_col, how="left")


def correlate_streams(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    on: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM interval join: pair each ``left_type`` event with
    every ``right_type`` event of the same ``on`` key that follows it
    within ``within`` (the classic click→purchase attribution shape).

    Structured Streaming's stream-stream inner join needs BOTH sides
    watermarked plus a time-range join condition so it can bound state:
    a buffered left event is dropped once the watermark passes
    ``left.ts + within`` — state stays proportional to the lateness
    horizon, not the stream length. The batch twin is the identical
    self-join with the same range predicate; with availableNow
    processing and a watermark at least as large as the data's
    disorder, stream output == batch output (pinned by the parity
    test + STREAMPARITY artifact).
    """
    base = events.withWatermark("ts", watermark)
    left = base.filter(F.col("event_type") == left_type).select(
        F.col(on).alias("__k"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    )
    right = base.filter(F.col("event_type") == right_type).select(
        F.col(on).alias("__k2"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
    )
    joined = left.join(
        right,
        (F.col("__k") == F.col("__k2"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"interval {within}")),
        "inner",
    )
    return joined.select(
        F.col("__k").alias(on), "left_id", "left_ts", "right_id", "right_ts"
    )


def near_dedup_sink(
    docs: DataFrame,
    store_bands: DataFrame,
    store_shingles: DataFrame,
    out_path: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming incremental NEAR dedup: each micro-batch of arriving
    documents runs the batch ``near_dedup_against`` verbatim against
    the persisted MinHash store and appends the SURVIVORS to
    ``out_path`` — the near-dup twin of ``dedup_against_store_stream``.

    foreachBatch rather than a stream-static join, because the near
    tier needs per-document aggregations (MinHash signatures over the
    batch's shingles) that a continuous streaming plan would reject;
    inside foreachBatch the micro-batch is a plain bounded DataFrame,
    so the decision logic is the SAME CODE PATH as the batch tier —
    parity by construction, which the STREAMPARITY twin pins. Per-batch
    decisions consult only the store (in-stream duplicates remain
    ``dedup_stream``'s watermark contract), so stream output ==
    batch output over the same files regardless of file batching.
    """
    from data_export_tool_spark.operators.dedup import near_dedup_against

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        survivors = near_dedup_against(
            batch,
            store_bands,
            store_shingles,
            threshold=threshold,
            id_col=id_col,
            text_col=text_col,
        )
        survivors.write.mode("append").parquet(out_path)

    writer = docs.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def upsert_sink(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    order_by: list[str] | None = None,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Incremental CDC apply: each micro-batch of change rows is merged
    into the parquet ``target_path`` with operators/upsert.merge_upsert
    (update-beats-existing, optional version ordering) — the streaming
    form of the c01 catalog entry.

    Write protocol: merge → write to a staging dir → directory swap
    (rename target aside, rename staging in, drop the old copy), with
    a RECOVERY pre-step so a crash at any point between those renames
    is repaired on checkpoint replay: no-target-but-old-exists means
    the crash hit between the two renames — the old copy IS the last
    committed snapshot and is restored before merging; target-and-old
    both present means the crash hit after the swap — the old copy is
    dead and dropped. Without the pre-step a replayed batch would
    rebuild the table from that batch alone, silently discarding all
    previously merged history. This is exactly the commit problem
    table formats (Delta/Iceberg) solve with metadata transactions —
    on a real lake deployment ``foreachBatch`` would issue MERGE INTO
    against such a table and the swap disappears; the merge plan
    itself (one shuffle on the merge keys) is unchanged.
    """
    import glob
    import shutil
    from pathlib import Path

    from data_export_tool_spark.operators.upsert import merge_upsert
    from data_export_tool_spark.operators.window_dedup import latest_per_key

    spark = stream.sparkSession

    # foreachBatch functions execute on the DRIVER (only the plans they
    # build run on executors), so plain imports are safe here
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        tgt = Path(target_path)
        # sort by the NUMERIC batch-id suffix: lexicographic order puts
        # '__old_10' before '__old_2', and after a silently-failed
        # cleanup (rmtree ignore_errors) plus a between-renames crash
        # the string-newest dir could be a stale snapshot — restoring
        # it would discard the committed one
        olds = sorted(
            glob.glob(f"{target_path}__old_*"),
            key=lambda p: int(p.rsplit("_", 1)[-1]),
        )
        if olds and not tgt.exists():
            # crashed between the two renames: the newest old copy is
            # the last committed snapshot — restore it
            Path(olds[-1]).rename(target_path)
            olds = olds[:-1]
        for left_over in olds:  # post-swap crash leftovers are dead
            shutil.rmtree(left_over, ignore_errors=True)
        if tgt.exists():
            current = spark.read.parquet(target_path)
            merged = merge_upsert(current, batch, keys, order_by=order_by)
        elif order_by is None:
            merged = batch
        else:
            merged = latest_per_key(batch, keys, order_by)
        staging = f"{target_path}__staging_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        old = f"{target_path}__old_{batch_id}"
        if tgt.exists():
            tgt.rename(old)
        Path(staging).rename(target_path)
        shutil.rmtree(old, ignore_errors=True)

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)

_GAP_MS = 3_600_000


def _session_fn(key, pdf_iter, state: GroupState):
    """Stateful per-user session assembly: events extend the open
    session while within the gap; a larger gap (or the event-time
    timeout, i.e. the watermark passing last_event + gap) emits the
    closed session and opens a new one.

    Late (out-of-order) events within the watermark never rewind the
    session end (``max`` guard) — they extend the count and, when
    earlier than the recorded start, the session start."""
    import pandas as pd

    (user_id,) = key
    closed: list[tuple[int, int, int, int]] = []  # (start, end, n)

    if state.hasTimedOut:
        if state.exists:
            start_ms, last_ms, n = state.get
            closed.append((user_id, start_ms, last_ms, n))
            state.remove()
    else:
        ts_all = []
        for pdf in pdf_iter:
            ts_all.extend(
                int(t.value // 1_000_000) for t in pd.to_datetime(pdf["ts"])
            )
        # Spark does NOT filter late rows for arbitrary stateful ops
        # (only for windowed aggregations); enforcing the watermark here
        # is this operator's responsibility, or replayed/backfilled
        # out-of-order files would stitch long-dead sessions together
        wm = state.getCurrentWatermarkMs()
        ts_all = sorted(t for t in ts_all if t >= wm)
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = None, None, 0
        for t in ts_all:
            if start_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > _GAP_MS:
                closed.append((user_id, start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                start_ms = min(start_ms, t)
                last_ms, n = max(last_ms, t), n + 1
        if start_ms is not None:
            state.update((start_ms, last_ms, n))
            # close when the WATERMARK (not wall clock) passes the gap
            # boundary; Spark requires the timeout to sit beyond the
            # current watermark
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_ms + _GAP_MS, wm + 1))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": pd.to_datetime([c[1] for c in closed], unit="ms"),
                "session_end": pd.to_datetime([c[2] for c in closed], unit="ms"),
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (applyInPandasWithState) — the streaming twin of
    queries.events_q.e03_event_sessions.

    Event-time timeouts keyed to the watermark: a session closes when
    the watermark passes ``last_event + gap``, so emitted sessions
    agree with the batch twin regardless of processing speed (a
    processing-time timeout would close sessions on wall-clock idle
    time, diverging from event-time semantics under replay/backfill).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("done", ArrayType(LongType())),
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_s", ArrayType(LongType())),
    ]
)


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming funnel progression — the stateful twin of
    ``operators.funnel.funnel_steps``, with the watermark-buffer
    pattern every out-of-order-correct sequence matcher uses (Flink
    CEP does exactly this): events newer than the watermark are
    BUFFERED in per-user state, and only once the watermark passes an
    event's time is it folded into the greedy chain in event-time
    order. The emitted chain is therefore always a PREFIX of the batch
    fold over the same (non-late) events — never a divergent guess
    from arrival order.

    Emits one row per user per batch in which the user was touched
    (``update`` semantics): ``(user_id, n_steps, ts_1..ts_k)`` with the
    chain as of the current watermark; the final emission per user is
    the settled chain. Late events (older than the watermark on
    arrival) are dropped, same policy as ``sessionize_stream``. An
    event-time timeout re-fires the fold when the watermark passes a
    buffered event even if the user receives no further events.

    State = completed chain (≤ k timestamps) + the pending buffer,
    which is bounded by the user's event volume within one watermark
    horizon — the honest cost of exact out-of-order funnels; shrink
    the watermark to shrink state.
    """
    import pandas as pd

    k = len(steps)
    if k < 1 or len(set(steps)) != k:
        raise ValueError(f"steps must be non-empty and unique: {steps}")
    idx = {s: i + 1 for i, s in enumerate(steps)}

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("n_steps", LongType())]
        + [StructField(f"ts_{i + 1}", TimestampType()) for i in range(k)]
    )

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            done, pend_ts, pend_s = (list(x) for x in state.get)
        else:
            done, pend_ts, pend_s = [], [], []
        # state timestamps are MICROSECONDS (parquet/batch precision —
        # truncating to ms would emit chains the batch fold disagrees
        # with at sub-ms event times); the GroupState watermark/timeout
        # API itself speaks milliseconds
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf["event_type"].isin(idx)]
                if len(sel) == 0:
                    continue
                # normalize to ns BEFORE the integer view: depending
                # on the pandas/Arrow pairing the series arrives as
                # datetime64[ns] OR datetime64[us], and a bare
                # astype(int64) silently yields different units
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, ty in zip(ts_us, sel["event_type"]):
                    if t >= wm_us:  # late events drop, as in sessionize
                        pend_ts.append(int(t))
                        pend_s.append(idx[ty])

        # fold every buffered event the watermark has passed, in
        # event-time order (ties by step index, matching the batch fold)
        ready = sorted(
            (t, s) for t, s in zip(pend_ts, pend_s) if t < wm_us
        )
        rest = [(t, s) for t, s in zip(pend_ts, pend_s) if t >= wm_us]
        for t, s in ready:
            n = len(done)
            if n < k and s == n + 1 and (n == 0 or t > done[-1]):
                done.append(t)
        pend_ts, pend_s = [t for t, _ in rest], [s for _, s in rest]
        state.update((done, pend_ts, pend_s))
        if pend_ts:
            state.setTimeoutTimestamp(
                max(min(pend_ts) // 1000 + 1, wm_us // 1000 + 1)
            )

        row = {"user_id": [user_id], "n_steps": [len(done)]}
        for i in range(k):
            row[f"ts_{i + 1}"] = pd.to_datetime(
                [done[i] if len(done) > i else None], unit="us"
            )
        yield pd.DataFrame(row)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_topk_counts(
    events: DataFrame,
    item_col: str = "user_id",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-(window, item) counts in APPEND mode — the
    candidate stage of streaming top-k. Rows emit only when their
    window CLOSES (watermark passes window end), which is what makes
    downstream ranking sound: every group of a window finalizes at the
    same watermark advance, so a closed window's rows always arrive in
    the same micro-batch and ``rank_window_topk`` can rank complete
    windows inside ``foreachBatch``. State is bounded by the watermark
    horizon (open windows only)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_len).alias("win"),
            F.col(item_col).alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "item", "cnt")
    )


def rank_window_topk(counts: DataFrame, k: int) -> DataFrame:
    """Top-``k`` items per window by count (ties broken by item value
    ascending — deterministic). Shared by the streaming sink and the
    batch twin, so stream and batch can never rank differently."""
    from pyspark.sql import Window

    w = Window.partitionBy("win_start").orderBy(F.desc("cnt"), F.asc("item"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("win_start", "rank", "item", "cnt")
    )


def topk_sink(
    events: DataFrame,
    target_path: str,
    k: int = 3,
    item_col: str = "user_id",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming heavy-hitters: append per-closed-window top-``k``
    item counts to ``target_path``. The per-batch window ranking runs
    over only the batch's (closed-window) aggregate rows — tiny — so
    the Window here is not a scale concern; the heavy state
    (per-item counts) lives in the watermarked streaming aggregation,
    bounded by the horizon. The batch twin is
    ``rank_window_topk(<same groupBy on the static table>, k)``.

    Idempotence: foreachBatch is at-least-once, so each batch writes
    to its own ``batch_id=N`` partition directory with overwrite — a
    replayed batch after a crash rewrites the same directory instead
    of appending duplicate rank rows. Readers see ``batch_id`` as a
    discovered partition column (write provenance for free).

    ``trigger_available_now=False`` runs as a continuous stream
    (micro-batch cadence from the source) instead of drain-and-stop.
    """
    counts = windowed_topk_counts(events, item_col, window_len, watermark)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        ranked = rank_window_topk(batch, k)
        ranked.write.mode("overwrite").parquet(
            f"{target_path}/batch_id={batch_id}"
        )

    writer = counts.writeStream.foreachBatch(apply_batch).outputMode("append")
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("last_tb", LongType()),
        StructField("last_type", StringType()),
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_tb", ArrayType(LongType())),
        StructField("pend_s", ArrayType(StringType())),
    ]
)

TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("prev_event", StringType()),
        StructField("next_event", StringType()),
        StructField("cnt", LongType()),
    ]
)


def transition_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming user-journey transitions — the stateful twin of
    ``operators.sequences.transition_counts``, built on the same
    watermark-buffer pattern as ``funnel_stream``: events newer than
    the watermark are BUFFERED in per-user state; once the watermark
    passes them they are consumed in exact event-time order
    ((ts, event_id) — the batch operator's ordering), each consumption
    emitting one ``prev → next`` pair against the carried last event.
    A pair, once emitted, is FINAL (its two events are both below the
    watermark and late events are dropped, same policy as the other
    twins), so the query runs in append mode and a downstream
    aggregation of the emitted partials equals the batch operator
    over the same consumed events by construction.

    Emits per-user per-batch partial counts ``(prev_event,
    next_event, cnt)`` — alphabet-bounded, like the batch fold's
    partition partials. State = last consumed event + one watermark
    horizon of buffered events; an event-time timeout re-fires the
    fold when the watermark passes a buffered event even if the user
    goes quiet.
    """
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            last_ts, last_tb, last_type, pend_ts, pend_tb, pend_s = state.get
            pend = list(zip(pend_ts, pend_tb, pend_s))
        else:
            last_ts, last_tb, last_type, pend = None, None, None, []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf["event_type"].notna()]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, tb, ty in zip(
                    ts_us, sel["event_id"], sel["event_type"]
                ):
                    if t >= wm_us:  # late events drop
                        pend.append((int(t), int(tb), ty))

        ready = sorted(p for p in pend if p[0] < wm_us)
        pend = [p for p in pend if p[0] >= wm_us]
        counts: dict[tuple, int] = {}
        for t, tb, ty in ready:
            if last_type is not None:
                k = (last_type, ty)
                counts[k] = counts.get(k, 0) + 1
            last_ts, last_tb, last_type = t, tb, ty

        state.update(
            (
                last_ts,
                last_tb,
                last_type,
                [p[0] for p in pend],
                [p[1] for p in pend],
                [p[2] for p in pend],
            )
        )
        if pend:
            state.setTimeoutTimestamp(
                max(min(p[0] for p in pend) // 1000 + 1, wm_us // 1000 + 1)
            )
        if counts:
            yield pd.DataFrame(
                {
                    "prev_event": [k[0] for k in counts],
                    "next_event": [k[1] for k in counts],
                    "cnt": pd.Series(list(counts.values()), dtype="int64"),
                }
            )

    return (
        events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def histogram_bucket(col, cuts):
    """The drift-module bucket rule as a streaming-safe column:
    count of cut points the value exceeds; NULL → −1 (its own
    bucket). Shared between ``windowed_histogram_stream`` and its
    batch twin so the bucketing can never diverge."""
    arr = F.array(*[F.lit(float(c)) for c in sorted(cuts)])
    bin_id = F.size(F.filter(arr, lambda c: col > c))
    return F.when(col.isNotNull(), bin_id).otherwise(F.lit(-1)).cast("int")


def windowed_histogram_stream(
    events: DataFrame,
    cuts: list,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-window value histograms over a PINNED bucketing
    (the drift monitor's cut points — fit once on a baseline with
    ``drift.fit_drift_bins``, then watch every window's distribution
    arrive): counts per (window, bucket) with watermark-finalized
    windows. State per group is one long — bounded by windows ×
    (len(cuts)+2), never by row count. Counts are exact, so the batch
    twin computing the same expression over the same rows is EXACTLY
    equal (STREAMPARITY contract); a downstream consumer diffs
    windows against the baseline proportions with the same PSI
    arithmetic the batch monitor uses.
    """
    bucket = histogram_bucket(F.col(value_col), cuts)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"), bucket.alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias(
                "win_start"
            ),
            "bucket",
            "n",
        )
    )


def windowed_quantile_stream(
    events: DataFrame,
    probs: list,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 200,
) -> DataFrame:
    """Streaming per-window value quantiles via the KLL sketch
    aggregate — fixed-size state per window where an exact streaming
    percentile would buffer every value (the same state argument as
    ``windowed_distinct_stream``, for ranks instead of cardinality).
    Emits ``(win_start, n, quantiles array)`` per tumbling window.

    Parity contract is BOUND-based, not equality: KLL compaction is
    randomized, so stream and batch sketches of the same window can
    differ by a few ranks — ``n`` is exact and every estimate's true
    rank sits within the k-sketch error bound of its target (the
    STREAMPARITY row pins exactly that), unlike the deterministic
    HLL/histogram twins.
    """
    ps = [float(p) for p in probs]
    if not ps or not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError(f"probs must be fractions in [0,1]: {probs}")
    arr = ", ".join(repr(p) for p in ps)
    return (
        events.where(F.col(value_col).isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.expr(
                f"kll_sketch_agg_double(CAST({value_col} AS double), {int(k)})"
            ).alias("__sk")
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias(
                "win_start"
            ),
            F.expr("kll_sketch_get_n_double(__sk)").alias("n"),
            F.expr(
                f"kll_sketch_get_quantile_double(__sk, array({arr}))"
            ).alias("quantiles"),
        )
    )


def scored_alert_stream(
    events: DataFrame,
    model: dict,
    vec_col: str,
    ts_col: str = "ts",
    threshold: float = 0.8,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming model scoring + windowed alert aggregation: score each
    event through a trained :func:`linear.logreg_fit` model (the same
    codegen ``zip_with`` dot product batch scoring uses — scoring is a
    stateless projection, so it streams for free) and aggregate per
    tumbling event-time window: row count, count of scores >=
    ``threshold``, flagged share, and mean score — the
    "quality-degradation alarm" a curation pipeline hangs on its intake
    stream. State is one aggregate row per open window; the watermark
    closes windows and bounds it.

    The batch twin is the identical expression over the same files —
    scoring is deterministic and the aggregate is algebraic, so
    stream/batch equality is exact (STREAMPARITY ``model_scored_windows``).
    """
    from data_export_tool_spark.operators.linear import logreg_predict

    scored = logreg_predict(events, model, vec_col, "__p")
    # an unscorable event (NULL score: NULL/wrong-dim vector) must NOT
    # count as healthy — otherwise a retrain that changes feature dim
    # NULLs every score and the alarm reads flagged_share=0 exactly
    # when scoring is broken. NULL scores stay NULL here (sum/avg skip
    # them) and surface as n_unscored, which is itself alarm-worthy.
    flagged = F.when(F.col("__p") >= threshold, 1).otherwise(
        F.when(F.col("__p").isNotNull(), 0)
    )
    return (
        scored.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.count(F.lit(1)) - F.count("__p")).alias("n_unscored"),
            F.coalesce(F.sum(flagged), F.lit(0)).alias("n_flagged"),
            F.avg(flagged.cast("double")).alias("flagged_share"),
            F.avg("__p").alias("mean_score"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "n_events",
            "n_unscored",
            "n_flagged",
            "flagged_share",
            "mean_score",
        )
    )


ATTR_STATE_SCHEMA = StructType(
    [
        StructField("conv_ts", ArrayType(LongType())),
        StructField("touch_ts", ArrayType(LongType())),
        StructField("touch_kind", ArrayType(LongType())),
    ]
)


def attribution_stream(
    events: DataFrame,
    conversion_type: str,
    touch_types: list,
    model: str = "linear",
    lookback: str = "7 days",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming multi-touch attribution — the stateful twin of
    ``operators.attribution.attribute_conversions`` (twin #17), on the
    funnel/transition watermark-buffer pattern: per-user state buffers
    conversions and touches; a conversion's credit is computed and
    EMITTED (append mode, exactly once per distinct (user, conv_ts))
    only when the watermark passes its timestamp — at that point every
    touch with ``ts <= conv_ts`` has either arrived or is by definition
    late, so the credited set is final. Touches evict once
    ``touch_ts + lookback <= watermark`` (no future conversion can
    reach them), so state per user is bounded by one
    lookback-plus-watermark horizon of activity.

    Same credit models, window boundaries (same-ts counts,
    exactly-lookback-old excluded), (ts, type) tie ordering and
    duplicate-conversion collapse as the batch operator; late events
    drop by the shared policy. Under a single initial batch (watermark
    starts at 0 so nothing is late) the emitted rows EXACTLY equal the
    batch operator restricted to conversions older than the final
    watermark — the equality the twin test pins; under multi-batch
    arrival the usual prefix semantics apply.
    """
    import pandas as pd

    from data_export_tool_spark.operators.attribution import _MODELS

    if model not in _MODELS:
        raise ValueError(f"model must be one of {_MODELS}: {model!r}")
    if not touch_types or conversion_type in touch_types:
        raise ValueError("touch_types must be non-empty, conversion excluded")
    kinds = {t: i for i, t in enumerate(sorted(touch_types))}
    kind_names = sorted(touch_types)
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*(day|days|hour|hours)\s*", lookback)
    if not m:
        raise ValueError(
            f"lookback must be '<n> days' or '<n> hours': {lookback!r}"
        )
    unit_us = 86_400_000_000 if m.group(2).startswith("day") else 3_600_000_000
    look_us = int(m.group(1)) * unit_us

    out_schema = StructType(
        [
            StructField("user", LongType()),
            StructField("conv_ts", TimestampType()),
            StructField("touch_ts", TimestampType()),
            StructField("touch_type", StringType()),
            StructField("n_touches", LongType()),
            StructField("weight", DoubleType()),
        ]
    )

    def credit(cand):
        """cand: [(ts_us, kind)] sorted by (ts, type-name). Returns
        [(ts_us, kind, weight)] — mirrors the batch models."""
        k = len(cand)
        if model == "last":
            return [(*cand[-1], 1.0)]
        if model == "first":
            return [(*cand[0], 1.0)]
        if model == "linear":
            return [(*c, 1.0 / k) for c in cand]
        if k == 1:
            return [(*cand[0], 1.0)]
        if k == 2:
            return [(*c, 0.5) for c in cand]
        return (
            [(*cand[0], 0.4)]
            + [(*c, 0.2 / (k - 2)) for c in cand[1:-1]]
            + [(*cand[-1], 0.4)]
        )

    def fn(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.exists:
            convs, tts, tks = (list(x) for x in state.get)
        else:
            convs, tts, tks = [], [], []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[
                    pdf["event_type"].isin(list(kinds) + [conversion_type])
                ]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, ty in zip(ts_us, sel["event_type"]):
                    if t < wm_us:
                        continue  # late, shared drop policy
                    if ty == conversion_type:
                        if int(t) not in convs:  # duplicate collapse
                            convs.append(int(t))
                    else:
                        tts.append(int(t))
                        tks.append(kinds[ty])

        rows = []
        remaining = []
        for ct in sorted(convs):
            if ct >= wm_us:
                remaining.append(ct)
                continue
            cand = sorted(
                [
                    (t, k_)
                    for t, k_ in zip(tts, tks)
                    if t <= ct and t > ct - look_us
                ],
                key=lambda p: (p[0], kind_names[p[1]]),
            )
            if not cand:
                rows.append((ct, None, None, None, None))
            else:
                n = len(cand)
                for t, k_, w_ in credit(cand):
                    rows.append((ct, t, kind_names[k_], n, w_))
        convs = remaining
        # touch eviction: future conversions are >= wm
        keep = [
            (t, k_) for t, k_ in zip(tts, tks) if t + look_us > wm_us
        ]
        tts, tks = [t for t, _ in keep], [k_ for _, k_ in keep]
        state.update((convs, tts, tks))
        pending = convs + [t + look_us for t in tts]
        if pending:
            state.setTimeoutTimestamp(
                max(min(pending) // 1000 + 1, wm_us // 1000 + 1)
            )

        if rows:
            yield pd.DataFrame(
                {
                    "user": [user] * len(rows),
                    "conv_ts": pd.to_datetime(
                        [r[0] for r in rows], unit="us"
                    ),
                    "touch_ts": pd.to_datetime(
                        [r[1] for r in rows], unit="us"
                    ),
                    "touch_type": [r[2] for r in rows],
                    "n_touches": pd.array(
                        [r[3] for r in rows], dtype="Int64"
                    ),
                    "weight": [r[4] for r in rows],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=ATTR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


from pyspark.sql.types import BooleanType  # noqa: E402 (twin #18 below)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_v", ArrayType(DoubleType())),
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("bucket_start", TimestampType()),
        StructField("v", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("is_change", BooleanType()),
        StructField("direction", StringType()),
    ]
)


def cusum_stream(
    buckets: DataFrame,
    target: float,
    sigma: float,
    k_sigma: float = 0.5,
    h_sigma: float = 5.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming two-sided CUSUM alerting — twin #18, the stateful
    sibling of ``operators.timeseries.cusum_changepoints`` with
    explicit reference-period ``target``/``sigma`` (a stream cannot
    know its own series-wide μ/σ; the batch operator's estimated mode
    has no streaming analogue, honestly).

    Input is BUCKET-grain rows ``(key string, bucket_start timestamp,
    v double)`` — the resample grid's shape. The same watermark-buffer
    pattern as the funnel/transition/attribution twins: buckets newer
    than the watermark are buffered in per-key state; once the
    watermark passes them they are consumed in exact bucket_start
    order, each consumption advancing the textbook recursion
    S⁺ = max(0, S⁺ + v − μ − κ), S⁻ = max(0, S⁻ + μ − v − κ) and
    emitting one FINAL row (append mode; late buckets drop, the
    standard twin policy). State = two doubles + one
    watermark-horizon of buffered buckets; an event-time timeout
    re-fires the fold when the watermark passes a buffered bucket
    even if the key goes quiet.
    """
    import pandas as pd

    kap = float(k_sigma) * float(sigma)
    h = float(h_sigma) * float(sigma)
    mu = float(target)
    armed = float(sigma) > 0

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            sp, sn, pend_ts, pend_v = state.get
            pend = list(zip(pend_ts, pend_v))
        else:
            sp, sn, pend = 0.0, 0.0, []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf["v"].notna()]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["bucket_start"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, v in zip(ts_us, sel["v"]):
                    if t >= wm_us:  # late buckets drop
                        pend.append((int(t), float(v)))

        ready = sorted(p for p in pend if p[0] < wm_us)
        pend = [p for p in pend if p[0] >= wm_us]
        out = []
        for t, v in ready:
            sp = max(0.0, sp + (v - mu - kap))
            sn = max(0.0, sn + (mu - v - kap))
            up = armed and sp > h
            dn = armed and sn > h
            d = "both" if (up and dn) else "up" if up else "down" if dn else None
            out.append((t, v, sp, sn, up or dn, d))

        state.update((sp, sn, [p[0] for p in pend], [p[1] for p in pend]))
        if pend:
            state.setTimeoutTimestamp(
                max(min(p[0] for p in pend) // 1000 + 1, wm_us // 1000 + 1)
            )
        if out:
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "bucket_start": pd.to_datetime(
                        pd.Series([t for t, *_ in out], dtype="int64"), unit="us"
                    ),
                    "v": [v for _, v, *_ in out],
                    "s_pos": [s for _, _, s, *_ in out],
                    "s_neg": [s for _, _, _, s, *_ in out],
                    "is_change": [c for *_, c, _ in out],
                    "direction": [d for *_, d in out],
                }
            )

    return (
        buckets.where(F.col("key").isNotNull() & F.col("bucket_start").isNotNull())
        .withWatermark("bucket_start", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


PAIR_STATE_SCHEMA = StructType(
    [
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_ty", ArrayType(StringType())),
    ]
)

PAIR_OUTPUT_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("item_a", StringType()),
        StructField("item_b", StringType()),
        StructField("cnt", LongType()),
    ]
)


def pair_counts_stream(
    events: DataFrame,
    window_seconds: int = 86400,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-window co-occurrence pairs — twin #19, the
    stateful sibling of the batch basket projection (`frequent_pairs`'
    basket-item stage with basket = (user, tumbling window)): which
    event types co-occur for the same user inside a window.

    Same watermark-buffer pattern as funnel/transition/CUSUM: per-user
    state buffers (ts, event_type); a WINDOW closes when the watermark
    passes its end, at which point the user's distinct item set for
    that window is final — emit its a<b pairs once (append mode; late
    events drop). Emitted rows are per-user per-window partials with
    ``cnt`` — alphabet²-bounded per user-window — so a downstream
    ``groupBy(window_start, item_a, item_b).sum(cnt)`` equals the
    batch projection over the same consumed events by construction.
    State = one watermark horizon of buffered events per user; an
    event-time timeout fires closings for quiet users.
    """
    import pandas as pd

    win_us = int(window_seconds) * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            pend_ts, pend_ty = state.get
            pend = list(zip(pend_ts, pend_ty))
        else:
            pend = []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf["event_type"].notna()]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, ty in zip(ts_us, sel["event_type"]):
                    if t >= wm_us:  # late events drop
                        pend.append((int(t), ty))

        # a window [w, w+win) is closed once wm >= w+win
        closed: dict[int, set] = {}
        keep = []
        for t, ty in pend:
            w = (t // win_us) * win_us
            if w + win_us <= wm_us:
                closed.setdefault(w, set()).add(ty)
            else:
                keep.append((t, ty))
        pend = keep

        state.update(([p[0] for p in pend], [p[1] for p in pend]))
        if pend:
            state.setTimeoutTimestamp(
                max(
                    ((min(p[0] for p in pend) // win_us) * win_us + win_us)
                    // 1000
                    + 1,
                    wm_us // 1000 + 1,
                )
            )
        rows = []
        for w, items in sorted(closed.items()):
            s = sorted(items)
            for i in range(len(s)):
                for j in range(i + 1, len(s)):
                    rows.append((w, s[i], s[j]))
        if rows:
            yield pd.DataFrame(
                {
                    "window_start": pd.to_datetime(
                        pd.Series([r[0] for r in rows], dtype="int64"), unit="us"
                    ),
                    "item_a": [r[1] for r in rows],
                    "item_b": [r[2] for r in rows],
                    "cnt": pd.Series([1] * len(rows), dtype="int64"),
                }
            )

    return (
        events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=PAIR_OUTPUT_SCHEMA,
            stateStructType=PAIR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def kanon_release_stream(
    events: DataFrame,
    quasi_cols: Sequence[str] = ("event_type",),
    k: int = 5,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming k-anonymous windowed release — twin #20, the
    streaming face of the X109 disclosure audit: per closed tumbling
    window, publish per-quasi-key aggregates ONLY for classes with at
    least ``k`` distinct users (small classes are suppressed, the
    cell-suppression rule, so a released row never isolates fewer
    than k people).

    Suppression needs EXACT distinct users (a privacy gate must not
    run on an estimate), and streaming forbids ``count_distinct``
    inside an aggregation — so this is TWO CHAINED stateful windowed
    aggregations (Spark 4 supports stateful chaining in append mode):
    first (window, quasi, user) partials — the dedup grain — then the
    class rollup counting those user rows. Both share the watermark;
    class size is final exactly when the window closes, so suppression
    composes with append-mode finality for free.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    cols = list(quasi_cols)
    per_user = (
        events.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), *cols, F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__sv"),
        )
    )
    return (
        per_user.groupBy(F.col("win"), *cols)
        .agg(
            F.count(F.lit(1)).alias("class_users"),
            F.sum("__n").alias("n_events"),
            F.sum("__sv").cast("double").alias("sum_value"),
        )
        .where(F.col("class_users") >= k)
        .select(
            F.col("win.start").alias("window_start"), *cols,
            "class_users", "n_events", "sum_value",
        )
    )


def dp_release_stream(
    events: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    epsilon: float = 1.0,
    max_contributions: int = 1,
    window: str = "1 day",
    watermark: str = "2 hours",
    seed: int = 42,
) -> DataFrame:
    """Streaming ε-DP windowed count release — twin #21, the streaming
    face of X151 ``privacy.dp_release_counts``: per closed tumbling
    window, publish Laplace-noised per-group counts with USER-LEVEL
    contribution bounding (each user adds ≤ ``max_contributions`` to
    any (window, group) cell, so the per-release sensitivity is
    enforced, not assumed).

    Same chassis as the k-anonymity twin (#20): contribution bounding
    needs an exact per-user pre-aggregate, so TWO CHAINED stateful
    windowed aggregations (Spark 4 append-mode chaining) — (window,
    group, user) partial counts, then the group rollup summing
    ``least(count, cap)``. The noise is a PURE PROJECTION after the
    final aggregate (deterministic in (seed, window, group) — the
    batch operator's exact formula, so the batch twin replays the
    stream bit-for-bit), which composes with append finality: a cell
    is noised once, when its window closes. Per-window releases
    compose over the stream's lifetime — budget ε per window by the
    standard composition argument (documented trade in X151: a
    production seed must be secret entropy).
    """
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if max_contributions < 1:
        raise ValueError(f"max_contributions must be >= 1: {max_contributions}")
    from data_export_tool_spark.functions.hashing import md5_long

    cols = list(group_cols)
    per_user = (
        events.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), *cols, F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    counts = per_user.groupBy(F.col("win"), *cols).agg(
        F.sum(F.least(F.col("__c"), F.lit(max_contributions))).alias(
            "n_true_bounded"
        )
    )
    key = F.concat_ws(
        "␟",
        F.lit(str(seed)),
        F.col("win.start").cast("string"),
        *[F.col(c).cast("string") for c in cols],
    )
    u = (md5_long(key, 9, 8) + F.lit(0.5)) / F.lit(float(1 << 32))
    b = float(max_contributions) / float(epsilon)
    centered = u - F.lit(0.5)
    lap = -F.lit(b) * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    released = F.greatest(
        F.round(F.col("n_true_bounded") + lap).cast("long"),
        F.lit(0).cast("long"),
    )
    return counts.select(
        F.col("win.start").alias("window_start"),
        *cols,
        "n_true_bounded",
        released.alias("n_released"),
    )


def dp_quantile_release_stream(
    events: DataFrame,
    value_col: str = "value",
    probs: Sequence[float] = (0.5, 0.9),
    epsilon: float = 1.0,
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 16,
    group_cols: Sequence[str] = ("event_type",),
    max_contributions: int = 1,
    window: str = "1 day",
    watermark: str = "2 hours",
    seed: int = 42,
) -> DataFrame:
    """Streaming ε-DP windowed QUANTILE release — twin #27, the
    streaming face of X179 ``privacy.dp_release_quantiles``: per
    closed tumbling window, noised bounded-histogram quantiles with
    enforced user-level contribution bounding.

    Chassis: THREE chained stateful windowed aggregations (the #20/#21
    two-agg chain grown by one level, each grouping on the same event
    window — Spark 4 append-mode stateful chaining):

    1. (window, group, user, bin) partial counts — a bot user's
       million rows collapse here;
    2. (window, group, user) gathers the user's ≤ n_bins (bin, count)
       cells; the FIRST-M-UNITS cap (bin order — exactly the batch
       operator's law) is then a pure array fold + explode, bounded by
       n_bins;
    3. (window, group, bin) sums capped units → the released cells.

    Noise + CDF inversion are PURE PROJECTIONS after the final
    aggregate, composing with append finality (a window's histogram is
    noised once, at close). The noise key is
    ``seed␟window_start␟*group␟bin`` — byte-identical to the batch
    operator called with ``group_cols = [window_start, *group]`` on a
    pre-windowed frame, which is what the parity test replays.
    Sparse-release, NULL-on-no-signal, and secrecy contracts are
    X179's.
    """
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if max_contributions < 1:
        raise ValueError(f"max_contributions must be >= 1: {max_contributions}")
    if not hi > lo:
        raise ValueError(f"need hi > lo: {lo}, {hi}")
    probs = [float(p) for p in probs]
    if not probs or not all(0 < p <= 1 for p in probs):
        raise ValueError(f"probs must be in (0, 1]: {probs}")
    from data_export_tool_spark.functions.hashing import md5_long

    cols = list(group_cols)
    x = F.col(value_col).cast("double")
    w = (float(hi) - float(lo)) / n_bins
    clamped = F.least(F.greatest(x, F.lit(float(lo))), F.lit(float(hi)))
    bin_idx = F.least(
        F.floor((clamped - F.lit(float(lo))) / F.lit(w)).cast("int"),
        F.lit(n_bins - 1),
    )
    per_user_bin = (
        events.where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & x.isNotNull()
        )
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            *cols,
            F.col("user_id"),
            bin_idx.alias("__bin"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    gathered = per_user_bin.groupBy(F.col("win"), *cols, "user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__bin"), F.col("__c")))
        ).alias("__cells")
    )
    # first-m-units cap in bin order as an array fold (batch law),
    # then explode the kept units back to cells
    acc0 = F.struct(
        F.lit(int(max_contributions)).cast("long").alias("left"),
        F.array().cast("array<struct<bin:int,k:long>>").alias("kept"),
    )
    capped = F.aggregate(
        F.col("__cells"),
        acc0,
        lambda acc, c: F.struct(
            F.greatest(
                acc["left"] - c["__c"], F.lit(0).cast("long")
            ).alias("left"),
            F.when(
                F.least(c["__c"].cast("long"), acc["left"]) > 0,
                F.concat(
                    acc["kept"],
                    F.array(
                        F.struct(
                            c["__bin"].alias("bin"),
                            F.least(c["__c"].cast("long"), acc["left"]).alias(
                                "k"
                            ),
                        )
                    ),
                ),
            ).otherwise(acc["kept"]).alias("kept"),
        ),
    )["kept"]
    units = gathered.select(
        "win", *cols, F.explode(capped).alias("__u")
    ).select(
        "win", *cols, F.col("__u.bin").alias("__bin"), F.col("__u.k").alias("__k")
    )
    cells = units.groupBy(F.col("win"), *cols, "__bin").agg(
        F.sum("__k").alias("n_true")
    )
    key = F.concat_ws(
        "␟",
        F.lit(str(seed)),
        F.col("win.start").cast("string"),
        *[F.col(c).cast("string") for c in cols],
        F.col("__bin").cast("string"),
    )
    u = (md5_long(key, 9, 8) + F.lit(0.5)) / F.lit(float(1 << 32))
    b = float(max_contributions) / float(epsilon)
    centered = u - F.lit(0.5)
    lap = -F.lit(b) * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    noisy = cells.select(
        F.col("win"),
        *cols,
        "__bin",
        F.greatest(F.round(F.col("n_true") + lap), F.lit(0.0)).alias("__n"),
    )
    folded = noisy.groupBy(F.col("win"), *cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__bin"), F.col("__n")))
        ).alias("__cells"),
        F.sum("__n").alias("n_released_total"),
    )
    tot = F.col("n_released_total")
    picks = []
    for p in probs:
        target = F.lit(p) * tot
        a0 = F.struct(
            F.lit(0.0).alias("cum"), F.lit(None).cast("int").alias("bin")
        )
        picked = F.aggregate(
            F.col("__cells"),
            a0,
            lambda acc, c: F.struct(
                (acc["cum"] + c["__n"]).alias("cum"),
                F.when(
                    acc["bin"].isNull() & (acc["cum"] + c["__n"] >= target),
                    c["__bin"],
                ).otherwise(acc["bin"]).alias("bin"),
            ),
        )["bin"]
        val = F.when(
            tot > 0, F.lit(float(lo)) + (picked + F.lit(0.5)) * F.lit(w)
        )
        picks.append(
            F.struct(
                F.lit(p).alias("p"), F.round(val, 9).alias("value_released")
            )
        )
    return folded.select(
        F.col("win.start").alias("window_start"),
        *cols,
        F.explode(F.array(*picks)).alias("__q"),
        tot.cast("long").alias("n_released_total"),
    ).select(
        "window_start",
        *cols,
        F.col("__q.p").alias("p"),
        F.col("__q.value_released").alias("value_released"),
        "n_released_total",
    )


def view_click_join_stream(
    events: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming view→click attribution join — twin #22, and the
    suite's first STREAM-STREAM JOIN (every other twin is an
    aggregation; interval joins exercise Spark's two-sided state
    store + watermark eviction instead): each click joins every view
    by the SAME user whose timestamp precedes it by at most
    ``within`` (the X13 theta-join/attribution window shape, inner
    form).

    Both sides carry a watermark and the join predicate carries the
    time bound in BOTH directions (equality-keyed on user +
    ``view_ts ∈ [click_ts − within, click_ts]``) — the conditions
    Spark needs to bound both state stores and emit append-finally.
    Output: one row per qualifying (view, click) pair with the lag —
    the row grain a downstream credit model consumes.
    """
    base = events.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    views = (
        base.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            f"""
            v_user = c_user AND
            view_ts <= click_ts AND
            view_ts >= click_ts - INTERVAL {within}
            """
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (F.unix_millis("click_ts") - F.unix_millis("view_ts")).alias("lag_ms"),
    )


def view_click_outer_stream(
    events: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming view→click attribution, LEFT OUTER form — twin #26
    (VERDICT r7 missing-#3): every qualifying (view, click) pair AND
    one NULL-click row per view that attracted no click inside its
    ``within`` window — the "impression with no click" accounting row
    every attribution pipeline needs for CTR denominators.

    Same two-sided watermarked interval join as
    :func:`view_click_join_stream` (equality on user +
    ``view_ts ∈ [click_ts − within, click_ts]``), with ``leftOuter``:
    Spark holds each view in state until the GLOBAL watermark passes
    ``view_ts + within`` (no future click can qualify), then emits the
    unmatched row append-finally with NULL click_id/click_ts/lag_ms.
    Views younger than that horizon at any point in the stream are
    still undecided and correctly emit nothing yet — batch-twin
    comparisons must restrict to the closed region
    ``view_ts + within < final watermark``.
    """
    base = events.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    views = (
        base.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            f"""
            v_user = c_user AND
            view_ts <= click_ts AND
            view_ts >= click_ts - INTERVAL {within}
            """
        ),
        "leftOuter",
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (F.unix_millis("click_ts") - F.unix_millis("view_ts")).alias("lag_ms"),
    )


def benford_stream(
    events: DataFrame,
    value_col: str = "value",
    window: str = "1 day",
    watermark: str = "2 hours",
    min_rows: int = 100,
) -> DataFrame:
    """Streaming Benford first-digit monitor — twin #23, the streaming
    face of the X163 audit: per closed tumbling window, the observed
    first-significant-digit distribution of ``value_col`` with χ²,
    Nigrini MAD and the 0.015 conformity verdict — the
    fabricated-numbers screen as a continuous control instead of a
    batch audit.

    ONE stateful windowed aggregation (nine conditional counts — the
    digit alphabet is the state, 9 longs per window) + a pure
    post-aggregate projection for the statistics; a window's verdict
    is computed once, at close (append finality). Small windows
    (< ``min_rows``) answer ``conforms = NULL`` — too small to call,
    matching the batch operator's contract.
    """
    import math

    from data_export_tool_spark.operators.validate import (
        first_significant_digit,
    )

    # SHARED digit extraction with the batch benford_audit (ADVICE r7:
    # the old format_number(|x|, 10) form rounded 9.99999999999 up to
    # digit 1 and dropped nonzero values < 5e-11)
    first = first_significant_digit(F.col(value_col))
    base = (
        events.where(
            F.col("ts").isNotNull()
            & F.col(value_col).isNotNull()
            & (F.abs(F.col(value_col).cast("double")) > 0)
        )
        .withColumn("__d", first)
        .where(F.col("__d").rlike("^[1-9]$"))
        .withWatermark("ts", watermark)
    )
    counts = base.groupBy(F.window("ts", window).alias("win")).agg(
        *[
            F.sum((F.col("__d") == str(d)).cast("long")).alias(f"n{d}")
            for d in range(1, 10)
        ]
    )
    n = sum((F.col(f"n{d}") for d in range(2, 10)), F.col("n1"))
    chi2 = F.lit(0.0)
    mad = F.lit(0.0)
    for d in range(1, 10):
        exp = math.log10(1 + 1 / d)
        obs = F.col(f"n{d}") / n
        chi2 = chi2 + n * (obs - exp) * (obs - exp) / F.lit(exp)
        mad = mad + F.abs(obs - exp) / 9.0
    return counts.select(
        F.col("win.start").alias("window_start"),
        n.alias("n"),
        F.round(chi2, 6).alias("chi2"),
        F.round(mad, 6).alias("mad"),
        F.when(n >= min_rows, mad <= 0.015).alias("conforms"),
    )


def ohlc_stream(
    events: DataFrame,
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming OHLC bars — twin #24, the streaming face of X168
    ``timeseries.ohlc_bars``: per (keys, closed tumbling window) the
    deterministic open/high/low/close/volume. ``min_by``/``max_by``
    over the NULL-masked (ts, value) ordering struct are plain
    aggregates, so this is ONE stateful windowed aggregation whose
    state per open bar is five scalars + two (ts, value) pairs —
    constant per bar regardless of event volume (a million ticks in
    one bar fold map-side). Bars emit once, at window close."""
    cols = list(keys)
    v = F.col(value_col).cast("double")
    ordk = F.when(v.isNotNull(), F.struct(F.col("ts").alias("t"), v.alias("v")))
    return (
        events.where(F.col("ts").isNotNull() & v.isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), *cols)
        .agg(
            F.min_by(v, ordk).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordk).alias("close"),
            F.count(v).alias("n"),
            F.round(F.sum(v), 6).alias("volume"),
        )
        .select(
            F.col("win.start").alias("bucket_start"), *cols,
            "open", "high", "low", "close", "n", "volume",
        )
    )


def decayed_counters_stream(
    events: DataFrame,
    half_life: str = "1 day",
    keys: Sequence[str] = ("user_id",),
    window: str = "1 day",
    watermark: str = "2 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Streaming decayed engagement counters — twin #25, the streaming
    face of X162 ``pit.decayed_counters`` with the window END as each
    bar's as-of instant: per (keys, closed tumbling window) the
    2^(−age/half_life)-weighted count (and sum), where age is measured
    to the window's end.

    The weight is a PRE-AGGREGATE projection (each row's window end
    derives from its own timestamp by floor arithmetic — no join, no
    state beyond the running weighted sums), so this is ONE stateful
    windowed aggregation with two floats of state per open (key,
    window) cell; a bot user's million rows fold map-side, exactly the
    batch operator's no-skew-cliff argument."""
    from data_export_tool_spark.operators.pit import decayed_counters as _dc  # noqa: F401 (doc anchor)

    cols = list(keys)
    win_s = _interval_seconds(window)
    hl_s = _interval_seconds(half_life)
    ts_s = F.unix_millis(F.col("ts").cast("timestamp")) / 1000.0
    win_end = (F.floor(ts_s / win_s) + 1) * win_s
    age = win_end - ts_s
    w = F.pow(F.lit(2.0), -age / F.lit(float(hl_s)))
    base = events.where(F.col("ts").isNotNull()).withColumn("__w", w)
    if value_col is not None:
        base = base.withColumn(
            "__wv", F.col("__w") * F.col(value_col).cast("double")
        )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("__w"), 6).alias("cnt_decayed"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum("__wv"), 6).alias("sum_decayed"))
    return (
        base.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), *cols)
        .agg(*aggs)
        .select(F.col("win.start").alias("window_start"), *cols, *[
            c for c in ["n_events", "cnt_decayed"]
            + (["sum_decayed"] if value_col is not None else [])
        ])
    )


def _interval_seconds(interval: str) -> float:
    qty, unit = interval.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
        "week": 604800, "weeks": 604800,
    }.get(unit)
    if mult is None:
        raise ValueError(f"unsupported interval unit: {interval!r}")
    return float(qty) * mult


def _parse_duration_us(s: str) -> int:
    """'N unit' → microseconds for the units the twins use (second,
    minute, hour, day; plural tolerated)."""
    parts = s.strip().split()
    if len(parts) != 2:
        raise ValueError(f"duration must be 'N unit': {s!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s").lower()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}.get(unit)
    if mult is None or n <= 0:
        raise ValueError(f"unsupported duration: {s!r}")
    return n * mult * 1_000_000


MSPRT_STATE_SCHEMA = StructType(
    [
        StructField("na", LongType()),
        StructField("sa", DoubleType()),
        StructField("sqa", DoubleType()),
        StructField("nb", LongType()),
        StructField("sb", DoubleType()),
        StructField("sqb", DoubleType()),
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_arm", ArrayType(StringType())),
        StructField("pend_val", ArrayType(DoubleType())),
    ]
)

MSPRT_OUTPUT_SCHEMA = StructType(
    [
        StructField("experiment_id", StringType()),
        StructField("bucket_start", LongType()),
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
        StructField("diff", DoubleType()),
        StructField("p_always_valid", DoubleType()),
        StructField("significant", StringType()),
    ]
)


def msprt_monitor_stream(
    events: DataFrame,
    tau: float,
    group_a: str = "A",
    group_b: str = "B",
    experiment_col: str = "experiment_id",
    arm_col: str = "arm",
    value_col: str = "value",
    bucket: str = "1 hour",
    watermark: str = "30 minutes",
    alpha: float = 0.05,
) -> DataFrame:
    """Continuous mSPRT experiment monitor — twin #29, the streaming
    face of X190 ``experiment.msprt_always_valid`` and the reason the
    always-valid p exists at all: the dashboard PEEKS every bucket,
    and mSPRT is the statistic built to be peeked at.

    Custom stateful operator (``applyInPandasWithState``, the
    transition_stream watermark-buffer pattern), keyed by EXPERIMENT —
    the parallel unit is the experiment, correct for a monitor whose
    state is six running floats: rows buffer until the watermark
    passes their BUCKET'S END (the windowed-agg finality rule), then
    fold in exact bucket order into the running sufficient statistics
    (n, Σx, Σx² per arm); one row per closed bucket emits the
    always-valid p computed over ALL data up to that bucket —
    append-final, since only below-watermark rows fed it. Late rows
    drop (the suite-wide policy). ``tau`` is REQUIRED here: the batch
    default (observed pooled SE) changes per prefix, which would make
    each bucket's p incomparable and the batch twin unreplayable.

    Variance uses the sums-of-squares form ``(Σx² − (Σx)²/n)/(n−1)``
    — algebraically the batch ``var_samp``; the twin pins agreement at
    1e-7 relative (double-precision cancellation at monitor scale is
    far below that).

    Output: ``(experiment_id, bucket_start [epoch us], n_a, n_b, diff,
    p_always_valid, significant)`` — significant is 'up'/'down'/'none'
    at ``alpha`` (direction = sign of mean_b − mean_a).
    """
    if not tau > 0:
        raise ValueError(f"tau must be > 0: {tau}")
    import math as _math

    import pandas as pd

    bucket_us = _parse_duration_us(bucket)

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            na, sa, sqa, nb, sb, sqb, p_ts, p_arm, p_val = state.get
            pend = list(zip(p_ts, p_arm, p_val))
        else:
            na, sa, sqa, nb, sb, sqb, pend = 0, 0.0, 0.0, 0, 0.0, 0.0, []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf[arm_col].notna() & pdf[value_col].notna()]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, arm, v in zip(ts_us, sel[arm_col], sel[value_col]):
                    if t >= wm_us:  # late rows drop at arrival
                        pend.append((int(t), str(arm), float(v)))

        # consume whole CLOSED buckets in bucket order
        ready = sorted(
            p for p in pend if (p[0] // bucket_us + 1) * bucket_us <= wm_us
        )
        pend = [
            p for p in pend if (p[0] // bucket_us + 1) * bucket_us > wm_us
        ]
        out = []
        i = 0
        while i < len(ready):
            bstart = ready[i][0] // bucket_us * bucket_us
            while i < len(ready) and ready[i][0] // bucket_us * bucket_us == bstart:
                _, arm, v = ready[i]
                if arm == group_a:
                    na, sa, sqa = na + 1, sa + v, sqa + v * v
                elif arm == group_b:
                    nb, sb, sqb = nb + 1, sb + v, sqb + v * v
                i += 1
            if na >= 2 and nb >= 2:
                va = (sqa - sa * sa / na) / (na - 1)
                vb = (sqb - sb * sb / nb) / (nb - 1)
                s2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
                V = s2 * (1.0 / na + 1.0 / nb)
                diff = sb / nb - sa / na
                if V > 0:
                    t2 = tau * tau
                    lam = _math.sqrt(V / (V + t2)) * _math.exp(
                        diff * diff * t2 / (2.0 * V * (V + t2))
                    )
                    p = min(1.0, 1.0 / lam)
                    sig = (
                        "none" if p >= alpha else ("up" if diff > 0 else "down")
                    )
                    out.append((key[0], bstart, na, nb, round(diff, 9),
                                round(p, 12), sig))

        state.update(
            (na, sa, sqa, nb, sb, sqb,
             [p[0] for p in pend], [p[1] for p in pend], [p[2] for p in pend])
        )
        if pend:
            nxt = min((p[0] // bucket_us + 1) * bucket_us for p in pend)
            state.setTimeoutTimestamp(max(nxt // 1000 + 1, wm_us // 1000 + 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["experiment_id", "bucket_start", "n_a", "n_b",
                         "diff", "p_always_valid", "significant"],
            )

    return (
        events.where(F.col("ts").isNotNull())
        .withColumn(
            "__exp",
            F.coalesce(F.col(experiment_col).cast("string"), F.lit("__all__"))
            if experiment_col in events.columns
            else F.lit("__all__"),
        )
        .withWatermark("ts", watermark)
        .groupBy("__exp")
        .applyInPandasWithState(
            fn,
            outputStructType=MSPRT_OUTPUT_SCHEMA,
            stateStructType=MSPRT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def psi_drift_stream(
    events: DataFrame,
    cuts: list,
    baseline_counts: dict,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    epsilon: float = 1e-6,
    psi_alert: float = 0.2,
) -> DataFrame:
    """Streaming PSI drift monitor — twin #30, the streaming face of
    ``drift.distribution_drift``: per closed tumbling window, the
    window's value distribution is compared against a FROZEN baseline
    histogram and one append-final alert row is emitted — the
    "retrain?" pager signal, continuously.

    ``baseline_counts`` maps ``histogram_bucket`` ids (−1 = NULL,
    0‥len(cuts) = cut intervals) to baseline counts — fit once from
    the baseline snapshot with the SAME pinned cuts (the
    ``fit_drift_bins`` → ``windowed_histogram_stream`` discipline; a
    drifting bucketing would make PSI meaningless).

    Chassis: TWO chained stateful windowed aggregations (the #20/#21
    append-mode chain): (window, bucket) partial counts — state one
    long per cell, ≤ len(cuts)+2 cells per window — then a (window)
    gather of the bucket cells (state = the cell structs). PSI / TVD /
    binned-KS against the baseline are PURE PROJECTIONS over that
    bounded cell map (a python-side loop over the FIXED layout builds
    ≤ n_bins+2 column terms — codegen, no UDF), composing with append
    finality: a window alerts once, at close.

    The arithmetic is byte-for-byte ``distribution_drift``'s: PSI
    ε-smoothed over ALL buckets including NULL, TVD unsmoothed, KS
    over the non-NULL binned CDF (NULL when either side has no
    non-NULL mass) — the parity test replays the batch operator per
    closed window and asserts equality.
    """
    layout = [-1] + list(range(len(cuts) + 1))
    total = float(sum(int(baseline_counts.get(b, 0)) for b in layout))
    if total <= 0:
        raise ValueError("baseline_counts has no mass on the bucket layout")
    eps = float(epsilon)
    po = {b: int(baseline_counts.get(b, 0)) / total for b in layout}
    nn_total = float(
        sum(int(baseline_counts.get(b, 0)) for b in layout if b >= 0)
    )

    bucket = histogram_bucket(F.col(value_col), cuts)
    counts = (
        events.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    gathered = counts.groupBy("win").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("__b", "__n")))
        ).alias("__h"),
        F.sum("__n").alias("n"),
    )

    n = F.col("n").cast("double")

    def cnt(b):
        return F.coalesce(
            F.element_at(F.col("__h"), F.lit(b)), F.lit(0).cast("long")
        ).cast("double")

    # PSI: ε-smoothed both sides, natural log (drift._psi)
    psi = F.lit(0.0)
    tvd = F.lit(0.0)
    for b in layout:
        po_s = max(po[b], eps)
        pn = F.greatest(cnt(b) / n, F.lit(eps))
        psi = psi + (pn - F.lit(po_s)) * F.log(pn / F.lit(po_s))
        tvd = tvd + F.abs(cnt(b) / n - F.lit(po[b]))
    tvd = F.lit(0.5) * tvd

    # binned KS over non-NULL buckets (drift.distribution_drift rule)
    nn = n - cnt(-1)
    ks = None
    if nn_total > 0:
        cum_o = 0.0
        cum_n = F.lit(0.0)
        diffs = []
        for b in layout:
            if b < 0:
                continue
            cum_o += int(baseline_counts.get(b, 0)) / nn_total
            cum_n = cum_n + cnt(b) / nn
            diffs.append(F.abs(cum_n - F.lit(cum_o)))
        ks = F.when(nn > 0, F.greatest(*diffs))
    return gathered.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias(
            "win_start"
        ),
        F.col("n"),
        psi.alias("psi"),
        tvd.alias("tvd"),
        (F.lit(None).cast("double") if ks is None else ks).alias("ks"),
        (psi >= F.lit(float(psi_alert))).alias("flagged"),
    )


QUOTA_STATE_SCHEMA = StructType(
    [
        StructField("tokens", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("pend_ts", ArrayType(LongType())),
        StructField("pend_id", ArrayType(LongType())),
    ]
)

QUOTA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("allowed", BooleanType()),
        StructField("tokens_after", DoubleType()),
    ]
)


def py_token_bucket(events, capacity: float, refill_per_sec: float):
    """Reference token-bucket fold over one key's ``(ts_us, event_id)``
    events in (ts, id) order — the exact per-event arithmetic
    ``quota_stream`` applies, exposed for the batch twin. The bucket
    starts FULL at the first event. Returns
    ``[(event_id, allowed, tokens_after)]``."""
    out = []
    tokens = float(capacity)
    last = None
    for t, eid in sorted(events):
        if last is not None:
            tokens = min(
                float(capacity), tokens + (t - last) / 1e6 * refill_per_sec
            )
        if tokens >= 1.0:
            allowed, tokens = True, tokens - 1.0
        else:
            allowed = False
        out.append((eid, allowed, tokens))
        last = t
    return out


def quota_stream(
    events: DataFrame,
    capacity: float = 5.0,
    refill_per_sec: float = 0.001,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-user token-bucket quota enforcement — twin #31,
    the rate-limiter decision log every API/ingest gateway needs as an
    ANALYTIC (which users would a given quota throttle, and when):
    each event costs one token from a per-user bucket of ``capacity``
    refilling at ``refill_per_sec``; one append-final row per event
    carries the allow/throttle decision and the balance after.

    Chassis: the ``transition_stream`` watermark-buffer custom
    stateful pattern (``applyInPandasWithState`` keyed by user) —
    events newer than the watermark buffer in state, and once the
    watermark passes them they are consumed in exact ``(ts, event_id)``
    order, folding the token balance forward. Decisions are final on
    emit (all earlier events are consumed — later ones cannot change
    an earlier balance), late events drop (suite policy), and an
    event-time timeout drains quiet users. State = (balance, last ts)
    + one watermark horizon of buffered events. The bucket starts
    full at the user's first event (the standard cold-start grant) —
    the batch twin replays the identical law.
    """
    import pandas as pd

    if capacity < 1.0:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    if refill_per_sec < 0.0:
        raise ValueError(f"refill_per_sec must be >= 0: {refill_per_sec}")
    cap = float(capacity)
    rate = float(refill_per_sec)

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            tokens, last_ts, pend_ts, pend_id = state.get
            pend = list(zip(pend_ts, pend_id))
        else:
            tokens, last_ts, pend = cap, None, []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf["event_id"].notna()]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t, eid in zip(ts_us, sel["event_id"]):
                    if t >= wm_us:  # late events drop
                        pend.append((int(t), int(eid)))

        ready = sorted(p for p in pend if p[0] < wm_us)
        pend = [p for p in pend if p[0] >= wm_us]
        rows = []
        for t, eid in ready:
            if last_ts is not None:
                tokens = min(cap, tokens + (t - last_ts) / 1e6 * rate)
            if tokens >= 1.0:
                allowed, tokens = True, tokens - 1.0
            else:
                allowed = False
            rows.append((int(key[0]), eid, t, allowed, tokens))
            last_ts = t

        state.update(
            (
                float(tokens),
                last_ts,
                [p[0] for p in pend],
                [p[1] for p in pend],
            )
        )
        if pend:
            state.setTimeoutTimestamp(
                max(min(p[0] for p in pend) // 1000 + 1, wm_us // 1000 + 1)
            )
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "event_id": pd.Series(
                        [r[1] for r in rows], dtype="int64"
                    ),
                    "ts_us": pd.Series([r[2] for r in rows], dtype="int64"),
                    "allowed": [r[3] for r in rows],
                    "tokens_after": [r[4] for r in rows],
                }
            )

    return (
        events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=QUOTA_OUTPUT_SCHEMA,
            stateStructType=QUOTA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


HEARTBEAT_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("open_alerted", BooleanType()),
        StructField("pend_ts", ArrayType(LongType())),
    ]
)

HEARTBEAT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("kind", StringType()),
        StructField("silent_from_us", LongType()),
        StructField("resumed_at_us", LongType()),
        StructField("gap_seconds", DoubleType()),
    ]
)


def heartbeat_stream(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming per-key heartbeat-silence monitor — twin #32, the
    dead-man switch every device-fleet / pipeline-liveness dashboard
    needs, and the streaming face of the batch gaps-and-islands
    operator (X208 ``islands.gaps``): one append-final alert row per
    silence of a key exceeding ``max_gap``.

    Two alert kinds:

    * ``'resumed'`` — emitted when the key's NEXT event is consumed
      and the gap to the previous consumed event exceeds ``max_gap``.
      Final on emit (consumption is in exact ts order behind the
      watermark — the ``transition_stream`` watermark-buffer chassis),
      and in exact parity with the batch lag-window gap scan over the
      same consumed events.
    * ``'open'`` — emitted AT MOST ONCE per silence via event-time
      timeout when the watermark passes ``last_event + max_gap`` with
      nothing buffered: the key has gone quiet and stayed quiet. If
      the key later resumes, the silence ALSO closes with a
      ``'resumed'`` row (dashboards pair them). WHETHER a mid-stream
      silence triggers its ``'open'`` row before the resume arrives
      depends on trigger/watermark timing — so the batch-twin parity
      contract is necessarily set-algebraic: ``'resumed'`` rows match
      exactly; ``'open'`` rows are a SUBSET of all gap-start points
      (interior or final) and a SUPERSET of the must-fire final open
      silences (deadline behind the final watermark). The twin test
      asserts all three.

    State per key: (last consumed ts, open-alerted flag, one watermark
    horizon of buffered events) — bounded; late events drop (suite
    policy). The ``open_alerted`` flag resets on resume so each
    distinct silence alerts once.
    """
    import pandas as pd

    gap_us = _parse_duration_us(max_gap)
    if gap_us <= 0:
        raise ValueError(f"max_gap must be positive: {max_gap}")

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            last_ts, open_alerted, pend = state.get
            pend = list(pend)
        else:
            last_ts, open_alerted, pend = None, False, []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                sel = pdf[pdf["ts"].notna()]
                if len(sel) == 0:
                    continue
                ts_us = (
                    pd.to_datetime(sel["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1_000
                )
                for t in ts_us:
                    if t >= wm_us:  # late events drop
                        pend.append(int(t))

        rows = []
        ready = sorted(t for t in pend if t < wm_us)
        pend = [t for t in pend if t >= wm_us]
        for t in ready:
            if last_ts is not None and t - last_ts > gap_us:
                rows.append(
                    (int(key[0]), "resumed", last_ts, t,
                     (t - last_ts) / 1e6)
                )
            last_ts = t
            open_alerted = False
        if (
            last_ts is not None
            and not pend
            and not open_alerted
            and wm_us - last_ts > gap_us
        ):
            rows.append((int(key[0]), "open", last_ts, None, None))
            open_alerted = True

        state.update((last_ts, bool(open_alerted), pend))
        if pend:
            state.setTimeoutTimestamp(
                max(min(pend) // 1000 + 1, wm_us // 1000 + 1)
            )
        elif last_ts is not None and not open_alerted:
            # arm the dead-man deadline so the 'open' alert fires even
            # if the key never speaks again
            state.setTimeoutTimestamp(
                max((last_ts + gap_us) // 1000 + 1, wm_us // 1000 + 1)
            )
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "kind": [r[1] for r in rows],
                    "silent_from_us": pd.Series(
                        [r[2] for r in rows], dtype="int64"
                    ),
                    "resumed_at_us": pd.array(
                        [r[3] for r in rows], dtype="Int64"
                    ),
                    "gap_seconds": pd.array(
                        [r[4] for r in rows], dtype="float64"
                    ),
                }
            )

    return (
        events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=HEARTBEAT_OUTPUT_SCHEMA,
            stateStructType=HEARTBEAT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def json_drift_stream(
    events: DataFrame,
    baseline: list[tuple],
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    col: str = "props",
    max_depth: int = 4,
) -> DataFrame:
    """Streaming JSON schema drift monitor — twin #33, the streaming
    face of the batch path profiler (X222 ``infer_json_schema``):
    per closed tumbling window, one append-final row for every
    OBSERVED (path, json_type) pair NOT in the frozen ``baseline``
    — the "payload v2 started shipping a new field / changed a type"
    alert every ingest pipeline wants before `from_json` starts
    NULLing.

    Chassis: a STATELESS Arrow projection (``mapInPandas`` running
    the exact ``py_json_paths`` walker — stateless transforms are
    streaming-legal) explodes each document to (ts, path, type)
    rows; the watermark re-attaches to the projected ``ts``; one
    windowed (window, path, type) count aggregates with append
    finality; a stream-static LEFT-ANTI join against the broadcast
    baseline keeps only novel pairs. State = the windowed-agg rows —
    (paths × types) per open window, bounded by the X222 explosion
    conventions (index-free arrays, depth cap).

    ``baseline``: list of ``(path, json_type)`` pairs (e.g. from a
    batch ``infer_json_schema`` run over the blessed corpus).
    Output: ``window_start, window_end, path, json_type, n``.
    """
    import pandas as pd

    from data_export_tool_spark.operators.jsonprof import py_json_paths

    if not baseline:
        raise ValueError("baseline must list known (path, type) pairs")

    def extract(batches):
        for pdf in batches:
            ts_out, p_out, t_out = [], [], []
            for ts, doc in zip(pdf["ts"], pdf["__doc"]):
                for p, t, _ex in py_json_paths(doc, max_depth):
                    ts_out.append(ts)
                    p_out.append(p)
                    t_out.append(t)
            if ts_out:
                yield pd.DataFrame(
                    {"ts": ts_out, "path": p_out, "json_type": t_out}
                )

    spark = events.sparkSession
    base_df = spark.createDataFrame(
        list(baseline), "path string, json_type string"
    )
    paths = (
        events.where(F.col(col).isNotNull() & F.col("ts").isNotNull())
        .select(F.col("ts"), F.col(col).cast("string").alias("__doc"))
        .mapInPandas(extract, "ts timestamp, path string, json_type string")
    )
    agg = (
        paths.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "path", "json_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        agg.join(F.broadcast(base_df), ["path", "json_type"], "left_anti")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "path",
            "json_type",
            "n",
        )
    )

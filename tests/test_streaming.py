"""Structured Streaming tests: the streaming pipelines must agree with
their oracle-checked batch twins (queries.events_q)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog, normalize_event_times
from data_export_tool_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
)
from tests.conftest import record_stream_parity


@pytest.fixture(scope="module")
def event_drop_dir(spark, sf_dir, tmp_path_factory):
    """Re-stage the events table as multiple parquet 'drops' so the
    file stream has several micro-batches to chew through."""
    out = str(tmp_path_factory.mktemp("event_drops"))
    ev = Catalog(spark, sf_dir).load("events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_ntz_events_parquet_normalized_on_every_path(spark, tmp_path):
    """Regression for the round-2 breakage: the driver regenerated
    events.parquet as TIMESTAMP_NTZ and un-casted ``unix_millis(ts)``
    callers died. All three read paths (helper, Catalog.load, file
    stream) must surface plain TIMESTAMP regardless of the parquet
    annotation."""
    ntz = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00", 7, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    base = tmp_path / "ntzdata"
    base.mkdir()
    path = str(base / "events.parquet")
    ntz.write.parquet(path)
    assert dict(spark.read.parquet(path).dtypes)["ts"] == "timestamp_ntz"

    assert dict(normalize_event_times(spark.read.parquet(path)).dtypes)["ts"] == "timestamp"
    loaded = Catalog(spark, str(base)).load("events")
    assert dict(loaded.dtypes)["ts"] == "timestamp"
    # unix_millis is the call that broke in round 2
    assert loaded.select(F.unix_millis("ts")).first()[0] is not None
    stream = read_events_stream(spark, path)
    assert stream.isStreaming and dict(stream.dtypes)["ts"] == "timestamp"

    # ANY table's NTZ columns normalize at the catalog boundary, not
    # just events.ts — the annotation drift isn't column-specific
    ntz_orders = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00")], "o_orderkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    ntz_orders.write.parquet(str(base / "orders.parquet"))
    loaded_orders = Catalog(spark, str(base)).load("orders")
    assert dict(loaded_orders.dtypes)["o_orderdate"] == "timestamp"
    assert loaded_orders.select(F.unix_millis("o_orderdate")).first()[0] is not None


def test_hourly_counts_stream_matches_batch(spark, sf_dir, event_drop_dir):
    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = hourly_counts_stream(stream)

    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM hourly_stream_test").collect()
    }

    from data_export_tool_spark.queries.events_q import e01_events_hourly

    # batch twin over the same re-staged files
    batch = e01_events_hourly(spark, sf_dir)
    # recompute batch on the SAME restaged data for an apples-to-apples set
    ev = normalize_event_times(spark.read.parquet(event_drop_dir))
    expected = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    record_stream_parity("hourly_windowed_agg", len(expected), got == expected)
    assert got == expected


def test_dedup_stream_matches_batch_distinct(spark, event_drop_dir, tmp_path):
    """dropDuplicatesWithinWatermark twin: duplicated drops in, each
    event_id out exactly once (all dups land within the horizon)."""
    from data_export_tool_spark.streaming.events import dedup_stream

    dup_dir = str(tmp_path / "dup_drops")
    ev = normalize_event_times(spark.read.parquet(event_drop_dir))
    ev.write.mode("overwrite").parquet(dup_dir)
    ev.write.mode("append").parquet(dup_dir)  # every event twice

    stream = read_events_stream(spark, dup_dir, max_files_per_trigger=4)
    out_dir = str(tmp_path / "dedup_out")
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    n_unique = ev.select("event_id").distinct().count()
    ok = (
        got.count() == n_unique
        and got.select("event_id").distinct().count() == n_unique
    )
    record_stream_parity("watermark_dedup", n_unique, ok)
    assert ok


def test_sessionize_stream_matches_batch_sessions(spark, event_drop_dir, tmp_path):
    """applyInPandasWithState sessionization with EVENT-TIME timeouts:
    every emitted session must be exactly a session the batch gap-split
    produces (sessions still open when the stream ends stay unemitted —
    the watermark never passes their gap boundary)."""
    from data_export_tool_spark.streaming.events import _GAP_MS, sessionize_stream

    # time-ordered drops written SEQUENTIALLY (the file source orders
    # batches by modification time): a real stream delivers roughly in
    # event-time order; randomly scattered files would make the
    # watermark drop most events, which is correct streaming behavior
    # but not a parity scenario
    ordered_dir = str(tmp_path / "ordered_drops")
    ev_src = normalize_event_times(spark.read.parquet(event_drop_dir))
    lo, hi = ev_src.agg(
        F.unix_millis(F.min("ts")), F.unix_millis(F.max("ts"))
    ).first()
    import time as _time

    for i in range(4):
        a = lo + (hi - lo) * i // 4
        b = lo + (hi - lo) * (i + 1) // 4 + (1 if i == 3 else 0)
        chunk = ev_src.filter(
            (F.unix_millis("ts") >= a) & (F.unix_millis("ts") < b)
        )
        chunk.coalesce(1).write.mode("append").parquet(ordered_dir)
        _time.sleep(1.1)  # distinct mtimes → deterministic batch order

    stream = read_events_stream(spark, ordered_dir, max_files_per_trigger=1)
    sessions = sessionize_stream(stream)
    out_dir = str(tmp_path / "sessions_out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1

    # batch truth: per-user gap split over the same restaged files
    pdf = ev_src.select("user_id", F.unix_millis("ts").alias("ms")).toPandas()
    expected = set()
    for user, grp in pdf.groupby("user_id"):
        ts = sorted(grp["ms"])
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > _GAP_MS:
                expected.add((user, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        expected.add((user, start, last, n))  # final (open) session

    got = {
        (
            r.user_id,
            int(r.session_start.timestamp() * 1000),
            int(r.session_end.timestamp() * 1000),
            r.n_events,
        )
        for r in rows
    }
    ok = bool(got) and got <= expected
    record_stream_parity("stateful_sessionize", len(got), ok)
    assert got, "stream emitted no closed sessions"
    assert got <= expected


def test_enrich_stream_matches_batch_join(spark, event_drop_dir, tmp_path):
    """Stream-static broadcast join: stream output == batch left join
    over the same files."""
    from data_export_tool_spark.streaming.events import enrich_stream

    dim = spark.createDataFrame(
        [(i, "gold" if i % 3 == 0 else "basic") for i in range(0, 200)],
        "user_id long, tier string",
    )
    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    q = (
        enrich_stream(stream, dim, on="user_id")
        .writeStream.format("memory")
        .queryName("enrich_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.tier)
        for r in spark.sql("SELECT event_id, tier FROM enrich_stream_test").collect()
    }
    ev = spark.read.parquet(event_drop_dir)
    expected = {
        (r.event_id, r.tier)
        for r in ev.join(dim, "user_id", "left").select("event_id", "tier").collect()
    }
    record_stream_parity("static_enrich_join", len(expected), got == expected)
    assert got == expected


def test_correlate_streams_matches_batch_interval_join(
    spark, event_drop_dir, tmp_path
):
    """Stream-stream interval join twin: click→purchase attribution
    pairs from the stream must equal the batch self-join with the same
    range predicate (watermark ≥ the drops' disorder, availableNow)."""
    from data_export_tool_spark.streaming.events import correlate_streams

    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    out_dir = str(tmp_path / "corr_out")
    q = (
        correlate_streams(stream, watermark="240 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "corr_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.left_id, r.right_id)
        for r in spark.read.parquet(out_dir).collect()
    }

    ev = normalize_event_times(spark.read.parquet(event_drop_dir))
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("left_id"), F.col("ts").alias("lts")
    )
    buys = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("rts"),
    )
    expected = {
        (r.user_id, r.left_id, r.right_id)
        for r in clicks.join(
            buys,
            (F.col("user_id") == F.col("u2"))
            & (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("interval 1 hour")),
        ).collect()
    }
    assert expected, "fixture produced no click→purchase pairs"
    record_stream_parity("interval_join", len(expected), got == expected)
    assert got == expected


def test_upsert_sink_applies_changesets_in_order(spark, tmp_path):
    """foreachBatch CDC apply: sequential changeset drops merged into a
    parquet target must equal the batch merge of the same changesets."""
    import time as _time

    from data_export_tool_spark.operators.upsert import merge_upsert
    from data_export_tool_spark.streaming.events import upsert_sink

    drops = tmp_path / "cs_drops"
    drops.mkdir()
    cs1 = spark.createDataFrame(
        [(k, 1, f"v1-{k}") for k in range(1, 11)], "k long, seq long, payload string"
    )
    cs2 = spark.createDataFrame(
        [(k, 2, f"v2-{k}") for k in range(5, 13)], "k long, seq long, payload string"
    )
    # FileStreamSource orders same-mtime files arbitrarily; sequential
    # writes with a >1s gap pin the micro-batch order
    cs1.coalesce(1).write.parquet(str(drops / "cs1"))
    _time.sleep(1.2)
    cs2.coalesce(1).write.parquet(str(drops / "cs2"))

    stream = (
        spark.readStream.schema("k long, seq long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops / "*"))
    )
    target = str(tmp_path / "target")
    q = upsert_sink(
        stream,
        target,
        keys=["k"],
        order_by=["seq"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r.k, r.seq, r.payload) for r in spark.read.parquet(target).collect()
    }
    expected = {
        (r.k, r.seq, r.payload)
        for r in merge_upsert(cs1, cs2, ["k"], order_by=["seq"]).collect()
    }
    ok = got == expected and len(got) == 12  # 1-4 from cs1, 5-12 from cs2
    record_stream_parity("cdc_upsert_sink", len(expected), ok)
    assert got == expected
    assert len(got) == 12


def test_read_events_stream_defined_before_first_drop(spark, tmp_path):
    # a file stream must be definable over an existing-but-empty drop
    # directory (producer not started yet): schema falls back to the
    # module's EVENT_SCHEMA instead of dying on batch inference
    empty = tmp_path / "no_drops_yet"
    empty.mkdir()
    stream = read_events_stream(spark, str(empty))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_upsert_sink_recovers_mid_swap_crash(spark, tmp_path):
    # simulate a crash BETWEEN the two swap renames: target gone, the
    # last committed snapshot sitting in __old_N. A replayed batch must
    # restore it before merging, not rebuild from the batch alone.
    import time as _time
    from pathlib import Path

    from data_export_tool_spark.streaming.events import upsert_sink

    drops = tmp_path / "cs"
    drops.mkdir()
    cs1 = spark.createDataFrame(
        [(k, 1, f"v1-{k}") for k in range(1, 6)], "k long, seq long, payload string"
    )
    cs1.coalesce(1).write.parquet(str(drops / "cs1"))
    target = str(tmp_path / "tgt")
    stream = (
        spark.readStream.schema("k long, seq long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops / "*"))
    )
    q = upsert_sink(
        stream, target, keys=["k"], order_by=["seq"],
        checkpoint=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 5

    # crash simulation: target renamed aside, new snapshot never landed
    Path(target).rename(f"{target}__old_7")
    _time.sleep(1.1)
    cs2 = spark.createDataFrame(
        [(k, 2, f"v2-{k}") for k in range(4, 8)], "k long, seq long, payload string"
    )
    cs2.coalesce(1).write.parquet(str(drops / "cs2"))
    stream2 = (
        spark.readStream.schema("k long, seq long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops / "*"))
    )
    q2 = upsert_sink(
        stream2, target, keys=["k"], order_by=["seq"],
        checkpoint=str(tmp_path / "ck"),
    )
    q2.awaitTermination(120)
    got = {(r.k, r.seq) for r in spark.read.parquet(target).collect()}
    # history (k=1..3 from cs1) survived the crash; cs2 upserted 4..7
    assert got == {(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2), (7, 2)}


def test_topk_sink_matches_batch_on_closed_windows(
    spark, sf_dir, event_drop_dir, tmp_path
):
    """Streaming heavy-hitters twin: per-closed-window top-k item
    counts from the foreachBatch sink must equal the batch ranking of
    the same windows. Append mode only emits windows the watermark has
    closed, so parity is asserted over exactly those windows — the
    trailing (still-open) windows are the bounded-state contract, not
    missing data."""
    from data_export_tool_spark.streaming.events import (
        rank_window_topk,
        read_events_stream,
        topk_sink,
    )

    # time-ordered drops (same rationale as the sessionize twin): a
    # real stream arrives roughly in event-time order; random file
    # order would make the watermark legitimately DROP late rows in
    # append mode, which is correct behavior but not a parity scenario
    ordered_dir = str(tmp_path / "topk_drops")
    ev_src = normalize_event_times(spark.read.parquet(event_drop_dir))
    lo, hi = ev_src.agg(
        F.unix_millis(F.min("ts")), F.unix_millis(F.max("ts"))
    ).first()
    import time as _time

    for i in range(4):
        a = lo + (hi - lo) * i // 4
        b = lo + (hi - lo) * (i + 1) // 4 + (1 if i == 3 else 0)
        ev_src.filter(
            (F.unix_millis("ts") >= a) & (F.unix_millis("ts") < b)
        ).coalesce(1).write.mode("append").parquet(ordered_dir)
        _time.sleep(1.1)

    out = str(tmp_path / "topk_out")
    stream = read_events_stream(spark, ordered_dir, max_files_per_trigger=1)
    q = topk_sink(
        stream,
        out,
        k=3,
        item_col="event_type",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r.win_start, r.rank): (r.item, r.cnt)
        for r in spark.read.parquet(out).collect()
    }
    assert got, "no window closed — watermark never advanced"

    ev = ev_src
    batch_counts = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("win"),
            F.col("event_type").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "item", "cnt")
    )
    expected_all = {
        (r.win_start, r.rank): (r.item, r.cnt)
        for r in rank_window_topk(batch_counts, 3).collect()
    }
    emitted_windows = {w for (w, _) in got}
    expected = {
        key: v for key, v in expected_all.items() if key[0] in emitted_windows
    }
    record_stream_parity("windowed_topk", len(expected), got == expected)
    assert got == expected
    # and the emitted set is exactly the closed windows: every window
    # strictly before the final watermark position must be present
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    missing = {
        w
        for (w, _) in expected_all
        if w + datetime.timedelta(hours=1) <= horizon.replace(minute=0, second=0, microsecond=0)
        and w not in emitted_windows
    }
    assert not missing, f"closed windows never emitted: {sorted(missing)[:3]}"


def test_funnel_stream_prefix_of_batch(spark, sf_dir, tmp_path):
    """Streaming funnel twin: with ts-sliced drops arriving in order,
    every emitted chain must be a PREFIX of the batch fold over the
    same events (the watermark buffer folds strictly in event-time
    order, so the stream can never emit a completion the batch
    disagrees with), and the stream must make real progress."""
    import time

    from data_export_tool_spark.operators.funnel import funnel_steps
    from data_export_tool_spark.streaming.events import funnel_stream

    steps = ["view", "click", "purchase"]
    ev = Catalog(spark, sf_dir).load("events").where(F.col("ts").isNotNull())
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.25, 0.5, 0.75], 0.0
    )
    drop_dir = str(tmp_path / "funnel_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)  # file-source ordering is by mtime (1s granularity)

    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = funnel_stream(stream, steps, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.sql("SELECT * FROM funnel_stream_test").collect()
    # n_steps is monotone per user, so the settled chain is the max row
    got = {}
    for r in emitted:
        cur = got.get(r["user_id"])
        if cur is None or r["n_steps"] > cur["n_steps"]:
            got[r["user_id"]] = r

    batch = {
        r["user_id"]: r
        for r in funnel_steps(
            normalize_event_times(spark.read.parquet(drop_dir)), steps
        ).collect()
    }
    checked = 0
    ok = True
    for u, r in got.items():
        n = r["n_steps"]
        b = batch.get(u)
        if b is None or n > b["n_steps"]:
            ok = False
            break
        for i in range(1, int(n) + 1):
            checked += 1
            if r[f"ts_{i}"] != b[f"ts_{i}"]:
                ok = False
    progressed = sum(int(r["n_steps"]) for r in got.values())
    ok = ok and progressed > 0 and checked > 0
    record_stream_parity("funnel_progression", checked, ok)
    assert ok, (progressed, checked)


def test_enrich_stream_scd2_matches_batch(spark, event_drop_dir, tmp_path):
    """Stream-static temporal join twin: streaming events enriched
    against an SCD-2 history must equal the batch scd2_join over the
    same files."""
    import datetime as dtm

    from data_export_tool_spark.operators.upsert import scd2_join
    from data_export_tool_spark.streaming.events import enrich_stream_scd2

    ev_batch = normalize_event_times(spark.read.parquet(event_drop_dir))
    lo, hi = ev_batch.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    users = [r["user_id"] for r in ev_batch.select("user_id").distinct().collect()]
    hist_rows = []
    for u in users:
        hist_rows.append((u, f"tier1_{u}", lo, mid, False))
        hist_rows.append((u, f"tier2_{u}", mid, None, True))
    hist = spark.createDataFrame(
        hist_rows,
        "user_id long, tier string, valid_from timestamp,"
        " valid_to timestamp, is_current boolean",
    )

    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    out = enrich_stream_scd2(stream, hist, ["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["event_id"]: r["tier"]
        for r in spark.sql("SELECT event_id, tier FROM scd2_enrich_test").collect()
    }
    want = {
        r["event_id"]: r["tier"]
        for r in scd2_join(ev_batch, hist, ["user_id"]).collect()
    }
    record_stream_parity("scd2_temporal_enrich", len(want), got == want)
    assert got == want
    # both generations actually exercised
    assert any(v and v.startswith("tier1_") for v in got.values())
    assert any(v and v.startswith("tier2_") for v in got.values())


def test_dedup_against_store_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming against-history dedup twin: documents re-staged as
    drops, store = fingerprints of an earlier corpus slice; the
    streamed survivors must equal the batch dedup_against result."""
    from data_export_tool_spark.operators.dedup import (
        dedup_against,
        fingerprint_store,
    )
    from data_export_tool_spark.streaming.events import (
        dedup_against_store_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = fingerprint_store(docs.where(F.col("doc_id") % 3 == 0))
    drop_dir = str(tmp_path / "doc_drops")
    docs.repartition(4).write.parquet(drop_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(drop_dir)
    )
    out = dedup_against_store_stream(stream, seen)
    q = (
        out.writeStream.format("memory")
        .queryName("store_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM store_dedup_test").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_against(
            spark.read.parquet(drop_dir), seen
        ).collect()
    )
    record_stream_parity("store_dedup", len(want), got == want)
    assert got == want
    assert got, "stream dropped everything"
    assert len(got) < docs.count(), "nothing was deduped"


def test_windowed_distinct_stream_matches_batch(spark, sf_dir, event_drop_dir):
    """Streaming HLL distinct-per-window == the identical batch
    expression over the same restaged files (HLL estimates are a
    deterministic function of the item set, so equality is exact)."""
    from data_export_tool_spark.streaming.events import (
        windowed_distinct_stream,
    )

    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    agg = windowed_distinct_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("distinct_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.hour, r.event_type): r.n_distinct
        for r in spark.sql("SELECT * FROM distinct_stream_test").collect()
    }
    ev = normalize_event_times(spark.read.parquet(event_drop_dir))
    expected = {
        (r.hour, r.event_type): r.n_distinct
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
                "n_distinct"
            )
        )
        .collect()
    }
    # sanity: the estimate tracks the true distinct count (5% HLL class)
    truth = {
        (r.hour, r.event_type): r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    close = all(
        abs(got[k] - truth[k]) <= max(2, 0.05 * truth[k]) for k in truth
    )
    record_stream_parity(
        "windowed_distinct_hll", len(expected), got == expected and close
    )
    assert got == expected
    assert close


def test_near_dedup_sink_matches_batch(spark, sf_dir, tmp_path):
    """Streaming NEAR-dedup against the MinHash store (foreachBatch
    running the batch operator per micro-batch): accumulated survivors
    must equal the batch near_dedup_against over the same files, and
    something must actually drop (the store slice overlaps the feed)."""
    from data_export_tool_spark.operators.dedup import (
        near_dedup_against,
        near_dup_store,
    )
    from data_export_tool_spark.streaming.events import near_dedup_sink

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # store = an earlier slice INCLUDING some docs re-arriving in the
    # feed (exact re-crawls are near-dups at any threshold)
    store_bands, store_sh = near_dup_store(
        docs.where(F.col("doc_id") % 3 == 0)
    )
    drop_dir = str(tmp_path / "near_drops")
    docs.repartition(4).write.parquet(drop_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(drop_dir)
    )
    out_dir = str(tmp_path / "near_survivors")
    q = near_dedup_sink(
        stream,
        store_bands,
        store_sh,
        out_dir,
        threshold=0.8,
        checkpoint=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(120)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in near_dedup_against(
            spark.read.parquet(drop_dir), store_bands, store_sh, threshold=0.8
        ).collect()
    )
    record_stream_parity("near_dedup_store", len(want), got == want)
    assert got == want
    assert got, "stream dropped everything"
    assert len(got) < docs.count(), "nothing was near-deduped"


def test_transition_stream_bounded_by_batch(spark, sf_dir, tmp_path):
    """Streaming transitions twin: every emitted (prev, next) count
    must be ≤ the batch operator's count over the same events (pairs
    are final on emission — append mode), and every pair whose second
    event the watermark has provably passed before the final batch
    MUST have been emitted. Together: the stream computes a watermark-
    delimited prefix of the batch transition multiset, never a
    divergent pair."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import transition_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.25, 0.5, 0.75], 0.0
    )
    drop_dir = str(tmp_path / "trans_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)  # file-source ordering is by mtime (1s granularity)

    wm_minutes = 30
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = transition_stream(stream, watermark=f"{wm_minutes} minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("transition_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = {}
    for r in spark.sql(
        "SELECT prev_event, next_event, SUM(cnt) AS n"
        " FROM transition_stream_test GROUP BY 1, 2"
    ).collect():
        emitted[(r["prev_event"], r["next_event"])] = int(r["n"])

    def pair_counts(extra_where: str) -> dict:
        return {
            (p, x): int(n)
            for p, x, n in duckdb.sql(
                f"""
                WITH seq AS (
                  SELECT event_type AS p, ts,
                         LEAD(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                         ) AS x,
                         LEAD(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                         ) AS next_ts
                  FROM read_parquet('{drop_dir}/*.parquet')
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL
                    AND event_type IS NOT NULL
                )
                SELECT p, x, COUNT(*) FROM seq
                WHERE x IS NOT NULL {extra_where} GROUP BY p, x
                """
            ).fetchall()
        }

    upper = pair_counts("")
    # the final batch's watermark: max event time of the first three
    # drops minus the delay (the 4th drop's times only advance the
    # watermark after the last data batch)
    cutoff_ms = (
        duckdb.sql(
            f"""
            SELECT MAX(epoch_ms(ts)) FROM read_parquet('{drop_dir}/*.parquet')
            WHERE epoch_ms(ts) < {int(bounds[2])}
            """
        ).fetchone()[0]
        - wm_minutes * 60 * 1000
    )
    low = pair_counts(
        f"AND epoch_ms(next_ts) < {cutoff_ms}"
    )

    ok = all(k in upper and n <= upper[k] for k, n in emitted.items())
    ok = ok and all(emitted.get(k, 0) >= n for k, n in low.items())
    ok = ok and sum(emitted.values()) > 0 and len(low) > 0
    record_stream_parity("transition_matrix", len(upper), ok)
    assert ok, (len(emitted), len(low), len(upper))


def test_windowed_histogram_stream_matches_batch(spark, sf_dir, event_drop_dir):
    """Streaming pinned-bucket histograms == the identical batch
    expression over the same restaged files (exact counts — the
    streaming face of the drift monitor's bucket rule)."""
    from data_export_tool_spark.streaming.events import (
        histogram_bucket,
        windowed_histogram_stream,
    )

    cuts = [10.0, 50.0, 100.0, 500.0]
    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    agg = windowed_histogram_stream(stream, cuts)
    q = (
        agg.writeStream.format("memory")
        .queryName("hist_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start, r.bucket): r.n
        for r in spark.sql("SELECT * FROM hist_stream_test").collect()
    }
    ev = normalize_event_times(spark.read.parquet(event_drop_dir))
    expected = {
        (r.win_start, r.bucket): r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias(
                "win_start"
            ),
            histogram_bucket(F.col("value"), cuts).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ok = got == expected and len(expected) > 0
    # bucket mass conservation: totals equal the row count
    ok = ok and sum(got.values()) == ev.count()
    record_stream_parity("windowed_histogram", len(expected), ok)
    assert ok


def test_windowed_quantile_stream_bounds(spark, sf_dir, event_drop_dir):
    """Streaming KLL per-window quantiles: n exact per window, every
    estimate's TRUE rank (exact per-window CDF from DuckDB) within
    2x the k=200 rank-error bound of its target."""
    import duckdb

    from data_export_tool_spark.streaming.events import (
        windowed_quantile_stream,
    )

    probs = [0.5, 0.9]
    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    agg = windowed_quantile_stream(stream, probs)
    q = (
        agg.writeStream.format("memory")
        .queryName("quant_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.win_start: (r.n, list(r.quantiles))
        for r in spark.sql("SELECT * FROM quant_stream_test").collect()
    }
    want_n = {
        w: int(n)
        for w, n in duckdb.sql(
            f"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M'),
                       count(value)
                FROM read_parquet('{event_drop_dir}/*.parquet')
                WHERE value IS NOT NULL GROUP BY 1"""
        ).fetchall()
    }
    ok = set(got) == set(want_n) and len(got) > 0
    checked = 0
    for w, (n, qs) in got.items():
        ok = ok and n == want_n[w]
        for p, est in zip(probs, qs):
            true_rank = duckdb.sql(
                f"""SELECT count(*) * 1.0 / {want_n[w]}
                    FROM read_parquet('{event_drop_dir}/*.parquet')
                    WHERE value IS NOT NULL AND value <= {est!r}
                      AND strftime(date_trunc('hour', ts),
                                   '%Y-%m-%d %H:%M') = '{w}'"""
            ).fetchone()[0]
            # sketch bound PLUS rank discreteness: a window with n
            # values only realizes ranks in multiples of 1/n
            ok = ok and abs(float(true_rank) - p) < 0.035 + 1.0 / want_n[w]
            checked += 1
    record_stream_parity("windowed_quantiles", checked, ok)
    assert ok


def test_scored_alert_stream_matches_batch(spark, sf_dir, event_drop_dir):
    """Twin #16: logreg scoring is a stateless codegen projection and
    the windowed alert aggregate is algebraic, so the streaming result
    must EXACTLY equal the identical batch expression over the same
    restaged files — model trained once on the batch frame, shared by
    both sides."""
    from data_export_tool_spark.operators.linear import (
        logreg_fit,
        logreg_predict,
    )
    from data_export_tool_spark.streaming.events import scored_alert_stream

    def featurize(df):
        return df.withColumn(
            "fv",
            F.array(
                F.coalesce(F.col("value"), F.lit(0.0)) / 100.0,
                (F.coalesce(F.col("user_id"), F.lit(0)) % 7).cast("double")
                / 7.0,
                F.hour("ts").cast("double") / 24.0,
            ),
        ).withColumn(
            "y", (F.col("event_type") == "error").cast("int")
        )

    batch = featurize(normalize_event_times(spark.read.parquet(event_drop_dir)))
    model = logreg_fit(batch, "y", "fv", iters=4, tol=0.0)

    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=2)
    agg = scored_alert_stream(
        featurize(stream), model, "fv", threshold=0.3
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("scored_alert_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (
            r["n_events"],
            r["n_unscored"],
            r["n_flagged"],
            round(r["flagged_share"], 9),
            round(r["mean_score"], 9),
        )
        for r in spark.sql("SELECT * FROM scored_alert_test").collect()
    }

    scored = logreg_predict(batch, model, "fv", "__p")
    flagged = F.when(F.col("__p") >= 0.3, 1).otherwise(
        F.when(F.col("__p").isNotNull(), 0)
    )
    expected = {
        r["window_start"]: (
            r["n_events"],
            r["n_unscored"],
            r["n_flagged"],
            round(r["flagged_share"], 9),
            round(r["mean_score"], 9),
        )
        for r in scored.groupBy(
            F.window(F.col("ts"), "1 hour").alias("win")
        )
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
        .collect()
    }
    record_stream_parity(
        "model_scored_windows", len(expected), got == expected
    )
    assert got == expected
    assert len(got) > 0


def test_scored_alert_unscorable_events_surface(spark):
    """A NULL/wrong-dim vector must surface as n_unscored and stay out
    of both flagged counts and the share denominator — never count as
    healthy (the alarm-dilution fix). Batch evaluation of the same
    expression (withWatermark is a no-op on batch frames)."""
    import datetime as dt

    from data_export_tool_spark.streaming.events import scored_alert_stream

    t = dt.datetime(2024, 7, 1, 10, 30)
    df = spark.createDataFrame(
        [
            (t, [4.0, 0.0]),   # scores high -> flagged
            (t, [-4.0, 0.0]),  # scores low -> unflagged
            (t, None),         # unscorable
            (t, [1.0]),        # wrong dim -> unscorable
        ],
        "ts timestamp, fv array<double>",
    )
    model = {"weights": [1.0, 0.0], "intercept": 0.0}
    row = scored_alert_stream(df, model, "fv", threshold=0.8).collect()[0]
    assert row["n_events"] == 4
    assert row["n_unscored"] == 2
    assert row["n_flagged"] == 1
    assert abs(row["flagged_share"] - 0.5) < 1e-12  # of the 2 SCORED


def test_attribution_stream_matches_batch(spark, sf_dir, event_drop_dir):
    """Twin #17: single initial batch (watermark starts at 0 → nothing
    late), then the event-time-timeout flush emits every conversion the
    final watermark passed. Those emissions must EXACTLY equal the
    batch attribute_conversions over the same files restricted to
    conversions below the final watermark — per-row weights included —
    and nothing above the watermark may emit."""
    import datetime as dt

    from data_export_tool_spark.operators.attribution import (
        attribute_conversions,
    )
    from data_export_tool_spark.streaming.events import attribution_stream

    conv, touches = "purchase", ["view", "click"]
    stream = read_events_stream(
        spark, event_drop_dir, max_files_per_trigger=100  # one data batch
    )
    q = (
        attribution_stream(
            stream, conv, touches, model="linear",
            lookback="3 days", watermark="2 days",
        )
        .writeStream.format("memory")
        .queryName("attr_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {}
    for r in spark.sql("SELECT * FROM attr_stream_test").collect():
        got.setdefault((r["user"], r["conv_ts"]), []).append(
            (r["touch_ts"], r["touch_type"],
             round(r["weight"], 9) if r["weight"] is not None else None,
             r["n_touches"])
        )

    ev = normalize_event_times(spark.read.parquet(event_drop_dir)).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    final_wm = max_ts - dt.timedelta(days=2)
    want = {}
    for r in attribute_conversions(
        ev, conv, touches, model="linear", lookback="3 days"
    ).collect():
        if r["conv_ts"] < final_wm:
            want.setdefault((r["user"], r["conv_ts"]), []).append(
                (r["touch_ts"], r["touch_type"],
                 round(r["weight"], 9) if r["weight"] is not None else None,
                 r["n_touches"])
            )

    # completeness: exactly the below-watermark conversions emitted
    ok = set(got) == set(want)
    # exactness: per-conversion credited rows match as multisets
    if ok:
        for key in want:
            ok = ok and sorted(got[key], key=str) == sorted(want[key], key=str)
    # nothing at/above the watermark leaked out
    ok = ok and all(cts < final_wm for _, cts in got)
    record_stream_parity("attribution_credits", len(want), bool(ok))
    assert ok
    assert len(want) > 20  # the slice is non-trivial


def test_cusum_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #18: streaming CUSUM with explicit reference params must
    EXACTLY reproduce the batch closed-form operator on every bucket
    the final watermark has passed (append-final rows), and emit
    nothing at-or-above the watermark."""
    import time

    from data_export_tool_spark.operators.timeseries import (
        cusum_changepoints,
        resample,
    )
    from data_export_tool_spark.streaming.events import cusum_stream

    ev = Catalog(spark, sf_dir).load("events")
    grid = resample(ev, "1 hour", {"v": F.sum("value")}, keys=["event_type"]).select(
        F.col("event_type").alias("key"), "bucket_start", "v"
    )
    TARGET, SIGMA = 10.0, 4.0

    # stage the grid as 4 time-ordered drops
    bounds = grid.select(F.unix_millis("bucket_start").alias("ms")).approxQuantile(
        "ms", [0.25, 0.5, 0.75], 0.0
    )
    drop_dir = str(tmp_path / "cusum_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = grid
        if lo is not None:
            sel = sel.where(F.unix_millis("bucket_start") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("bucket_start") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    stream = (
        spark.readStream.schema("key string, bucket_start timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = cusum_stream(
        stream, target=TARGET, sigma=SIGMA, watermark="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = {
        (r["key"], r["bucket_start"]): (
            round(r["s_pos"], 9), round(r["s_neg"], 9),
            r["is_change"], r["direction"],
        )
        for r in spark.sql("SELECT * FROM cusum_stream_test").collect()
    }
    max_ms = grid.agg(F.max(F.unix_millis("bucket_start"))).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    batch = {
        (r["key"], r["bucket_start"]): (
            round(r["s_pos"], 9), round(r["s_neg"], 9),
            r["is_change"], r["direction"],
        )
        for r in cusum_changepoints(
            grid, "v", keys=["key"], target=TARGET, sigma=SIGMA
        )
        .where(F.unix_millis("bucket_start") < wm_ms)
        .collect()
    }
    ok = emitted == batch and len(batch) > 0
    record_stream_parity("cusum_alerts", len(batch), ok)
    assert ok, (
        f"stream {len(emitted)} rows vs batch {len(batch)}; "
        f"diff={set(emitted.items()) ^ set(batch.items())}"
    )


def test_pair_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #19: per closed window the summed streamed pair partials
    must EXACTLY equal the batch (user, window) basket projection, and
    no unclosed window may leak."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import pair_counts_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.25, 0.5, 0.75], 0.0
    )
    drop_dir = str(tmp_path / "pair_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    WIN = 86400
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = pair_counts_stream(stream, window_seconds=WIN, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("pair_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = {
        (str(r["w"]), r["item_a"], r["item_b"]): int(r["n"])
        for r in spark.sql(
            "SELECT window_start AS w, item_a, item_b, SUM(cnt) AS n"
            " FROM pair_stream_test GROUP BY 1, 2, 3"
        ).collect()
    }
    max_ms = ev.agg(F.max(F.unix_millis("ts"))).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    want = {
        (str(w), a, b): int(n)
        for w, a, b, n in duckdb.sql(
            f"""
        WITH base AS (
          SELECT user_id, event_type,
                 to_timestamp(CAST(floor(epoch(ts) / {WIN}) * {WIN} AS BIGINT))
                   AT TIME ZONE 'UTC' AS w,
                 floor(epoch(ts) / {WIN}) * {WIN} AS wsec
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
            AND event_type IS NOT NULL
        ),
        closed AS (
          SELECT DISTINCT user_id, w, wsec, event_type FROM base
          WHERE (wsec + {WIN}) * 1000 <= {wm_ms}
        )
        SELECT l.w, l.event_type AS a, r.event_type AS b, count(*) AS n
        FROM closed l JOIN closed r
          ON l.user_id = r.user_id AND l.w = r.w
         AND l.event_type < r.event_type
        GROUP BY 1, 2, 3
        """
        ).fetchall()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("windowed_pair_counts", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)};"
        f" sample diff: {list(set(emitted.items()) ^ set(want.items()))[:4]}"
    )


def test_kanon_release_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #20: the streamed k-anonymous release must EXACTLY equal
    the batch windowed aggregate + suppression over closed windows,
    and never publish a class below k."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import kanon_release_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "kanon_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    K, WIN_S = 4, 86400
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = kanon_release_stream(
        stream, quasi_cols=("event_type",), k=K, window="1 day",
        watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("kanon_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (str(r["window_start"]), r["event_type"]): (
            r["class_users"], r["n_events"], round(r["sum_value"], 6)
        )
        for r in spark.sql("SELECT * FROM kanon_stream_test").collect()
    }
    assert all(v[0] >= K for v in emitted.values())
    max_ms = ev.agg(F.max(F.unix_millis("ts"))).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    want = {
        (str(w), t): (int(cu), int(n), round(float(sv), 6))
        for w, t, cu, n, sv in duckdb.sql(
            f"""
        WITH base AS (
          SELECT event_type, user_id, value,
                 to_timestamp(CAST(floor(epoch(ts) / {WIN_S}) * {WIN_S} AS BIGINT))
                   AT TIME ZONE 'UTC' AS w,
                 floor(epoch(ts) / {WIN_S}) * {WIN_S} AS wsec
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
        )
        SELECT w, event_type, count(DISTINCT user_id) AS cu, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        FROM base
        WHERE (wsec + {WIN_S}) * 1000 <= {wm_ms}
        GROUP BY 1, 2
        HAVING count(DISTINCT user_id) >= {K}
        """
        ).fetchall()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("kanon_release", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)};"
        f" diff {list(set(emitted.items()) ^ set(want.items()))[:4]}"
    )


def test_dp_release_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #21: the streamed DP release must EXACTLY equal the batch
    X151 operator (same contribution bounding, same seeded noise —
    group key = (window_start, group)) applied to the below-watermark
    rows, and never release a negative count."""
    import time

    from data_export_tool_spark.operators.privacy import dp_release_counts
    from data_export_tool_spark.streaming.events import dp_release_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "dp_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    EPS, CAP, SEED, WIN_S = 0.8, 2, 11, 86400
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = dp_release_stream(
        stream, group_cols=("event_type",), epsilon=EPS,
        max_contributions=CAP, window="1 day", watermark="30 minutes",
        seed=SEED,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dp_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_true_bounded"], r["n_released"]
        )
        for r in spark.sql("SELECT * FROM dp_stream_test").collect()
    }
    assert all(v[1] >= 0 for v in emitted.values())

    # batch twin: the X151 operator over closed windows only
    replay = spark.read.parquet(drop_dir).where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    max_ms = replay.agg(F.max(F.unix_millis("ts"))).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    windowed = replay.withColumn(
        "window_start",
        F.timestamp_seconds(
            F.floor(F.unix_millis("ts") / 1000 / WIN_S) * WIN_S
        ),
    ).where(
        (F.unix_millis("window_start") + WIN_S * 1000) <= F.lit(wm_ms)
    )
    want = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_true_bounded"], r["n_released"]
        )
        for r in dp_release_counts(
            windowed, ["window_start", "event_type"], epsilon=EPS,
            user_col="user_id", max_contributions=CAP, seed=SEED,
        ).collect()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("dp_release", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)}; "
        f"diff={set(emitted.items()) ^ set(want.items())}"
    )


def test_view_click_join_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #22 (first stream-stream join): the streamed interval
    join must emit EXACTLY the batch theta-join pairs — inner
    stream-stream matches emit as both sides arrive, and the
    time-ordered drops keep every within-window view alive in state
    until its clicks have arrived."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import view_click_join_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "vc_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = view_click_join_stream(stream, within="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("vc_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (r["view_id"], r["click_id"]): r["lag_ms"]
        for r in spark.sql("SELECT * FROM vc_join_test").collect()
    }
    want = {
        (int(v), int(c)): int(lag)
        for v, c, lag in duckdb.sql(
            f"""
        WITH base AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
        )
        SELECT v.event_id, c.event_id,
               epoch_ms(c.ts) - epoch_ms(v.ts)
        FROM base v JOIN base c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND v.ts <= c.ts
         AND v.ts >= c.ts - INTERVAL 1 HOUR
        """
        ).fetchall()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("view_click_join", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)}; "
        f"sample diff={list(set(emitted) ^ set(want))[:5]}"
    )


def test_view_click_outer_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #26 (stream-stream LEFT OUTER interval join, VERDICT r7
    missing-#3): matched pairs must equal the batch theta join
    EXACTLY; unmatched views must emit exactly one NULL-click row
    each — complete on the closed region (view_ts + within < final
    watermark: no future click can qualify) and NEVER spurious (a
    stream null row for a view the batch join matched would be a
    correctness bug, closed region or not)."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import view_click_outer_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "vco_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = view_click_outer_stream(stream, within="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("vco_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM vco_join_test").collect()
    emitted_pairs = {
        (r["view_id"], r["click_id"]): r["lag_ms"]
        for r in rows
        if r["click_id"] is not None
    }
    emitted_nulls = {r["view_id"] for r in rows if r["click_id"] is None}

    con = duckdb.connect()
    want_pairs = {
        (int(v), int(c)): int(lag)
        for v, c, lag in con.sql(
            f"""
        WITH base AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
        )
        SELECT v.event_id, c.event_id,
               epoch_ms(c.ts) - epoch_ms(v.ts)
        FROM base v JOIN base c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND v.ts <= c.ts
         AND v.ts >= c.ts - INTERVAL 1 HOUR
        """
        ).fetchall()
    }
    # batch truth: views with NO qualifying click, split by the final
    # global watermark = min(max view_ts, max click_ts) - 2h; a view's
    # outer row is due once view_ts + within < that watermark
    unmatched_all = {
        int(v)
        for (v,) in con.sql(
            f"""
        WITH base AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
        )
        SELECT v.event_id FROM base v
        WHERE v.event_type = 'view' AND NOT EXISTS (
          SELECT 1 FROM base c
          WHERE c.event_type = 'click' AND c.user_id = v.user_id
            AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR)
        """
        ).fetchall()
    }
    unmatched_closed = {
        int(v)
        for (v,) in con.sql(
            f"""
        WITH base AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ), wm AS (
          SELECT least(
            (SELECT max(ts) FROM base WHERE event_type = 'view'),
            (SELECT max(ts) FROM base WHERE event_type = 'click')
          ) - INTERVAL 2 HOUR AS w
        )
        SELECT v.event_id FROM base v, wm
        WHERE v.event_type = 'view'
          AND v.ts + INTERVAL 1 HOUR < wm.w
          AND NOT EXISTS (
          SELECT 1 FROM base c
          WHERE c.event_type = 'click' AND c.user_id = v.user_id
            AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR)
        """
        ).fetchall()
    }
    ok = (
        emitted_pairs == want_pairs
        and len(want_pairs) > 0
        and emitted_nulls <= unmatched_all          # never spurious
        and unmatched_closed <= emitted_nulls       # complete when closed
        and len(unmatched_closed) > 0               # the law actually bites
    )
    record_stream_parity("view_click_outer", len(want_pairs), ok)
    assert ok, (
        f"pairs: stream {len(emitted_pairs)} vs batch {len(want_pairs)}; "
        f"nulls: stream {len(emitted_nulls)}, closed-region due "
        f"{len(unmatched_closed)}, all-unmatched {len(unmatched_all)}; "
        f"spurious={list(emitted_nulls - unmatched_all)[:5]} "
        f"missing={list(unmatched_closed - emitted_nulls)[:5]}"
    )


def test_benford_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #23: the streamed per-window Benford statistics must
    EXACTLY equal a python replay of the batch formula over closed
    windows (same digit extraction, same χ²/MAD/verdict)."""
    import math
    import time

    from data_export_tool_spark.streaming.events import benford_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "benford_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    WIN_S, MIN_ROWS = 86400, 50
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = benford_stream(
        stream, window="1 day", watermark="30 minutes", min_rows=MIN_ROWS
    )
    q = (
        out.writeStream.format("memory")
        .queryName("benford_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        str(r["window_start"]): (r["n"], r["chi2"], r["mad"], r["conforms"])
        for r in spark.sql("SELECT * FROM benford_stream_test").collect()
    }
    # python replay over closed windows
    rows = spark.read.parquet(drop_dir).select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        F.col("value").cast("double").alias("v"),
        F.date_format(
            F.timestamp_seconds(
                F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / 1000 / WIN_S) * WIN_S
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("w"),
    ).where(F.col("v").isNotNull()).collect()
    max_ms = max(r["ms"] for r in rows)
    wm_ms = max_ms - 30 * 60 * 1000
    per_win: dict = {}
    for r in rows:
        if r["v"] == 0 or r["v"] is None:
            continue
        s = f"{abs(r['v']):.10f}".replace(".", "").lstrip("0")
        if not s or s[0] not in "123456789":
            continue
        wsec = (r["ms"] // 1000) // WIN_S * WIN_S
        if (wsec + WIN_S) * 1000 > wm_ms:
            continue  # window not closed
        per_win.setdefault(r["w"], {}).setdefault(int(s[0]), 0)
        per_win[r["w"]][int(s[0])] += 1
    want = {}
    for w, cells in per_win.items():
        n = sum(cells.values())
        chi2 = mad = 0.0
        for d in range(1, 10):
            obs = cells.get(d, 0) / n
            exp = math.log10(1 + 1 / d)
            chi2 += n * (obs - exp) ** 2 / exp
            mad += abs(obs - exp) / 9
        want[w] = (n, round(chi2, 6), round(mad, 6),
                   (mad <= 0.015) if n >= MIN_ROWS else None)
    ok = set(emitted) == set(want) and all(
        emitted[w][0] == want[w][0]
        and abs(emitted[w][1] - want[w][1]) < 1e-4
        and abs(emitted[w][2] - want[w][2]) < 1e-6
        and emitted[w][3] == want[w][3]
        for w in want
    ) and len(want) > 0
    record_stream_parity("benford_monitor", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)}; "
        f"keys diff={set(emitted) ^ set(want)}"
    )


def test_ohlc_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #24: streamed OHLC bars must EXACTLY equal the batch
    X168 operator over closed windows (same NULL-masked ordering
    struct, same tie rule)."""
    import time

    from data_export_tool_spark.operators.timeseries import ohlc_bars
    from data_export_tool_spark.streaming.events import ohlc_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "ohlc_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    WIN_S = 86400
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = ohlc_stream(
        stream, window="1 day", watermark="30 minutes",
        keys=("event_type",),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ohlc_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (str(r["bucket_start"]), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["volume"]
        )
        for r in spark.sql("SELECT * FROM ohlc_stream_test").collect()
    }
    # batch twin over closed windows only
    replay = spark.read.parquet(drop_dir)
    max_ms = replay.agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    batch = ohlc_bars(replay, "1 day", "value", keys=["event_type"])
    want = {
        (str(r["bucket_start"]), r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["volume"]
        )
        for r in batch.where(
            (F.unix_millis("bucket_start") + WIN_S * 1000) <= F.lit(wm_ms)
        ).collect()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("ohlc_bars", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)};"
        f" diff={set(emitted) ^ set(want)}"
    )


def test_decayed_counters_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #25: streamed per-window decayed counters must EXACTLY
    equal the DuckDB replay of the window-end-as-of weights over
    closed windows."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import decayed_counters_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "decay_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    WIN_S, HL_S = 86400, 21600  # 1-day bars, 6-hour half-life
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = decayed_counters_stream(
        stream.where(F.col("user_id").isNotNull()),
        half_life="6 hours", keys=("user_id",), window="1 day",
        watermark="30 minutes", value_col="value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("decay_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (str(r["window_start"]), r["user_id"]): (
            r["n_events"], r["cnt_decayed"], r["sum_decayed"]
        )
        for r in spark.sql("SELECT * FROM decay_stream_test").collect()
    }
    max_ms = spark.read.parquet(drop_dir).agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    want_rows = duckdb.sql(f"""
      WITH base AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               epoch(CAST(ts AS TIMESTAMP)) AS tsec,
               floor(epoch(CAST(ts AS TIMESTAMP)) / {WIN_S}) * {WIN_S} AS wsec
        FROM read_parquet('{drop_dir}/*.parquet')
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
      )
      SELECT strftime(to_timestamp(CAST(wsec AS BIGINT)), '%Y-%m-%d %H:%M:%S'),
             user_id, count(*),
             round(sum(pow(2.0, -((wsec + {WIN_S}) - tsec) / {HL_S})), 6),
             round(sum(v * pow(2.0, -((wsec + {WIN_S}) - tsec) / {HL_S})), 6)
      FROM base
      WHERE (wsec + {WIN_S}) * 1000 <= {wm_ms}
      GROUP BY 1, 2
    """).fetchall()
    want = {
        (w, int(u)): (int(n), float(c), float(sv))
        for w, u, n, c, sv in want_rows
    }
    ok = set(emitted) == set(want) and all(
        emitted[k][0] == want[k][0]
        and abs(emitted[k][1] - want[k][1]) < 1e-4
        and abs(emitted[k][2] - want[k][2]) < 1e-3
        for k in want
    ) and len(want) > 0
    record_stream_parity("decayed_counters", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)};"
        f" keys diff={list(set(emitted) ^ set(want))[:4]}"
    )


def test_dp_quantile_release_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #27: the streamed ε-DP quantile release must EXACTLY equal
    the batch X179 operator (same clamp/bin/first-m-units bounding,
    same seeded per-cell noise — batch called with group key
    (window_start, group) so the noise keys are byte-identical)
    applied to the below-watermark rows."""
    import time

    from data_export_tool_spark.operators.privacy import dp_release_quantiles
    from data_export_tool_spark.streaming.events import (
        dp_quantile_release_stream,
    )

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "dpq_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    EPS, CAP, SEED, WIN_S = 0.8, 2, 13, 86400
    PROBS, LO, HI, NB = [0.5, 0.9], 0.0, 100.0, 16
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = dp_quantile_release_stream(
        stream, "value", PROBS, epsilon=EPS, lo=LO, hi=HI, n_bins=NB,
        group_cols=("event_type",), max_contributions=CAP,
        window="1 day", watermark="30 minutes", seed=SEED,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dpq_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (str(r["window_start"]), r["event_type"], r["p"]): (
            r["value_released"], r["n_released_total"]
        )
        for r in spark.sql("SELECT * FROM dpq_stream_test").collect()
    }

    replay = spark.read.parquet(drop_dir).where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    max_ms = replay.agg(F.max(F.unix_millis("ts"))).first()[0]
    wm_ms = max_ms - 30 * 60 * 1000
    windowed = replay.withColumn(
        "window_start",
        F.timestamp_seconds(
            F.floor(F.unix_millis("ts") / 1000 / WIN_S) * WIN_S
        ),
    ).where(
        (F.unix_millis("window_start") + WIN_S * 1000) <= F.lit(wm_ms)
    )
    want = {
        (str(r["window_start"]), r["event_type"], r["p"]): (
            r["value_released"], r["n_released_total"]
        )
        for r in dp_release_quantiles(
            windowed, "value", PROBS, epsilon=EPS, lo=LO, hi=HI, n_bins=NB,
            group_cols=["window_start", "event_type"], user_col="user_id",
            max_contributions=CAP, seed=SEED,
        ).collect()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("dp_quantile_release", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)};"
        f" diff sample={list(set(emitted.items()) ^ set(want.items()))[:4]}"
    )


def test_windowed_topk_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #28: per closed window and user, the exact top-k event
    types with counts must equal the DuckDB batch rank — including the
    deterministic value-ascending tie-break."""
    import time

    import duckdb

    from data_export_tool_spark.streaming.events import windowed_topk_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "topk_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    K, WIN_S = 2, 86400
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = windowed_topk_stream(
        stream, "event_type", k=K, key_col="user_id",
        window="1 day", watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("topk_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (str(r["window_start"]), r["user_id"], r["rank"]): (r["value"], r["n"])
        for r in spark.sql("SELECT * FROM topk_stream_test").collect()
    }

    con = duckdb.connect()
    want = {
        (str(w), int(u), int(rk)): (v, int(n))
        for w, u, rk, v, n in con.sql(
            f"""
        WITH base AS (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM read_parquet('{drop_dir}/*.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
            AND event_type IS NOT NULL
        ), mx AS (
          SELECT max(ts) - INTERVAL 30 MINUTE AS wm FROM base
        ), counts AS (
          SELECT time_bucket(INTERVAL {WIN_S} SECOND, ts) AS ws,
                 user_id, event_type, COUNT(*) AS n
          FROM base GROUP BY 1, 2, 3
        ), ranked AS (
          SELECT ws, user_id, event_type, n, ROW_NUMBER() OVER (
            PARTITION BY ws, user_id ORDER BY n DESC, event_type ASC
          ) AS rk
          FROM counts
        )
        SELECT r.ws, r.user_id, r.rk, r.event_type, r.n
        FROM ranked r, mx
        WHERE r.rk <= {K} AND r.ws + INTERVAL {WIN_S} SECOND <= mx.wm
        """
        ).fetchall()
    }
    ok = emitted == want and len(want) > 0
    record_stream_parity("windowed_topk_per_key", len(want), ok)
    assert ok, (
        f"stream {len(emitted)} vs batch {len(want)};"
        f" diff={list(set(emitted.items()) ^ set(want.items()))[:5]}"
    )


def test_msprt_monitor_stream_matches_batch(spark, sf_dir, tmp_path):
    """Twin #29: every closed bucket's always-valid p must equal the
    batch X190 operator (same fixed tau) applied to ALL rows in
    buckets up to and including it — the cumulative prefix law that
    makes the monitor a correct peeker."""
    import time

    import pytest

    from data_export_tool_spark.operators.experiment import msprt_always_valid
    from data_export_tool_spark.streaming.events import msprt_monitor_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "ts",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.col("value").cast("double").alias("value"),
        F.lit("exp1").alias("experiment_id"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("props"),
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.33, 0.66], 0.0
    )
    drop_dir = str(tmp_path / "msprt_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    TAU, BUCKET_S = 5.0, 86400
    stream = (
        spark.readStream.schema(spark.read.parquet(drop_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = msprt_monitor_stream(
        stream, tau=TAU, bucket="1 day", watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("msprt_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        r["bucket_start"]: (r["n_a"], r["n_b"], r["p_always_valid"])
        for r in spark.sql("SELECT * FROM msprt_stream_test").collect()
    }
    assert emitted, "no bucket closed"

    replay = spark.read.parquet(drop_dir)
    checked = 0
    for bstart, (n_a, n_b, p) in sorted(emitted.items()):
        prefix = replay.where(
            F.unix_millis("ts") < F.lit((bstart // 1_000_000 + BUCKET_S) * 1000)
        )
        want = msprt_always_valid(
            prefix, "value", "arm", "A", "B", tau=TAU
        ).first()
        assert (want["n_a"], want["n_b"]) == (n_a, n_b), bstart
        assert p == pytest.approx(want["p_always_valid"], rel=1e-7), bstart
        checked += 1
    record_stream_parity("msprt_monitor", checked, True)


def test_psi_drift_stream_matches_batch_drift(spark, sf_dir, tmp_path):
    """Twin #30: per closed window, the streaming PSI/TVD/KS row must
    equal drift.distribution_drift run batch-side on exactly that
    window's rows against the same frozen baseline + pinned cuts."""
    import time

    from data_export_tool_spark.operators.drift import distribution_drift
    from data_export_tool_spark.streaming.events import (
        histogram_bucket,
        psi_drift_stream,
    )

    cuts = [10.0, 50.0, 100.0, 500.0]
    ev = Catalog(spark, sf_dir).load("events").where(F.col("ts").isNotNull())
    # frozen baseline = the first half by event time; the monitored
    # stream is the full feed (so later windows genuinely drift or not)
    mid = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )[0]
    baseline = ev.where(F.unix_millis("ts") < mid)
    baseline_counts = {
        int(r["b"]): int(r["n"])
        for r in baseline.groupBy(
            histogram_bucket(F.col("value"), cuts).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    drop_dir = str(tmp_path / "psi_drops")
    lo = None
    for hi in [mid, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = psi_drift_stream(
        stream, cuts, baseline_counts,
        window="1 day", watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("psi_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        r["win_start"]: r
        for r in spark.sql("SELECT * FROM psi_stream_test").collect()
    }

    # closed windows: end <= max_ts - watermark
    import datetime as _dt

    max_ts = ev.agg(F.max("ts")).first()[0]
    wm = max_ts - _dt.timedelta(minutes=30)
    want_windows = {
        r["w"]: int(r["n"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm").alias(
                "w"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if _dt.datetime.strptime(r["w"], "%Y-%m-%d %H:%M")
        + _dt.timedelta(days=1)
        <= wm
    }
    ok = set(emitted) == set(want_windows) and len(want_windows) > 0
    for w, row in emitted.items():
        if w not in want_windows:
            ok = False
            continue
        win_rows = ev.where(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm") == w
        )
        batch = distribution_drift(
            spark, baseline, win_rows,
            numeric_cols=["value"], bins={"value": cuts},
        ).first()
        ok = ok and row["n"] == batch["n_new"] == win_rows.count()
        ok = ok and abs(row["psi"] - batch["psi"]) < 1e-9
        ok = ok and abs(row["tvd"] - batch["tvd"]) < 1e-9
        if batch["ks"] is None:
            ok = ok and row["ks"] is None
        else:
            ok = ok and abs(row["ks"] - batch["ks"]) < 1e-9
        ok = ok and row["flagged"] == batch["flagged"]
    record_stream_parity("psi_drift_monitor", len(want_windows), ok)
    assert ok, f"emitted={sorted(emitted)}, want={sorted(want_windows)}"


def test_quota_stream_matches_batch_token_bucket(spark, sf_dir, tmp_path):
    """Twin #31: per-user token-bucket decisions over the event stream
    equal the python token-bucket replay over the same consumed
    (watermark-passed) events, in (ts, event_id) order."""
    import time

    from data_export_tool_spark.streaming.events import (
        py_token_bucket,
        quota_stream,
    )

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "quota_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    CAP, RATE = 1.0, 1.0 / 86400.0  # 1 token/day: the quota must bite
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = quota_stream(stream, capacity=CAP, refill_per_sec=RATE,
                       watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("quota_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        int(r["event_id"]): (bool(r["allowed"]), r["tokens_after"],
                             int(r["user_id"]))
        for r in spark.sql("SELECT * FROM quota_stream_test").collect()
    }

    import datetime as _dt

    max_ts = ev.agg(F.max("ts")).first()[0]
    wm_us = int((max_ts - _dt.timedelta(minutes=30)).timestamp() * 1e6)
    rows = [
        (int(r["user_id"]), int(r["us"]), int(r["event_id"]))
        for r in ev.select(
            "user_id", F.unix_micros("ts").alias("us"), "event_id"
        ).collect()
    ]
    by_user = {}
    for u, t_us, eid in rows:
        if t_us < wm_us:
            by_user.setdefault(u, []).append((t_us, eid))
    want = {}
    n_throttled = 0
    for u, evs in by_user.items():
        for eid, allowed, tokens in py_token_bucket(evs, CAP, RATE):
            want[eid] = (allowed, tokens, u)
            n_throttled += 0 if allowed else 1
    ok = set(emitted) == set(want) and len(want) > 0
    for eid, (allowed, tokens, u) in want.items():
        got = emitted.get(eid)
        if got is None:
            ok = False
            continue
        ok = ok and got[0] == allowed and got[2] == u
        ok = ok and abs(got[1] - tokens) < 1e-9
    # the quota must actually bite on this data, else the twin is vacuous
    ok = ok and n_throttled > 0
    record_stream_parity("quota_token_bucket", len(want), ok)
    assert ok, f"emitted={len(emitted)}, want={len(want)}, throttled={n_throttled}"


def test_heartbeat_stream_matches_batch_gap_scan(spark, sf_dir, tmp_path):
    """Twin #32: per-user silence alerts. 'resumed' rows equal the
    batch lag-window gap scan over consumed events exactly; 'open'
    rows are a subset of all gap-start points and a superset of the
    must-fire final open silences."""
    import time

    from data_export_tool_spark.streaming.events import heartbeat_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    bounds = ev.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    # construct guaranteed dead-man keys: users ≡ 3 (mod 7) go silent
    # at the median timestamp — their 'open' alert MUST fire
    ev = ev.where(
        ~(
            (F.pmod(F.col("user_id"), F.lit(7)) == 3)
            & (F.unix_millis("ts") >= bounds[0])
        )
    )
    drop_dir = str(tmp_path / "hb_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = ev
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    GAP = "2 days"
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = heartbeat_stream(stream, max_gap=GAP, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("heartbeat_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("SELECT * FROM heartbeat_stream_test").collect()
    got_resumed = {
        (int(r["user_id"]), int(r["silent_from_us"]),
         int(r["resumed_at_us"]))
        for r in emitted if r["kind"] == "resumed"
    }
    got_open = {
        (int(r["user_id"]), int(r["silent_from_us"]))
        for r in emitted if r["kind"] == "open"
    }
    # every resumed row's gap_seconds is consistent
    ok = all(
        abs(r["gap_seconds"] - (r["resumed_at_us"] - r["silent_from_us"])
            / 1e6) < 1e-6
        for r in emitted if r["kind"] == "resumed"
    )

    import datetime as _dt

    gap_us = 2 * 86400 * 1_000_000
    max_ts = ev.agg(F.max("ts")).first()[0]
    wm_us = int((max_ts - _dt.timedelta(minutes=30)).timestamp() * 1e6)
    rows = [
        (int(r["user_id"]), int(r["us"]))
        for r in ev.select(
            "user_id", F.unix_micros("ts").alias("us")
        ).collect()
    ]
    consumed, pending_users = {}, set()
    for u, t in rows:
        if t < wm_us:
            consumed.setdefault(u, []).append(t)
        else:
            pending_users.add(u)
    want_resumed, candidates, required = set(), set(), set()
    for u, ts in consumed.items():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            if b - a > gap_us:
                want_resumed.add((u, a, b))
                candidates.add((u, a))
        if u not in pending_users and wm_us - ts[-1] > gap_us:
            candidates.add((u, ts[-1]))
            required.add((u, ts[-1]))

    ok = ok and got_resumed == want_resumed and len(want_resumed) > 0
    ok = ok and got_open <= candidates and required <= got_open
    ok = ok and len(required) > 0  # the dead-man path must bite
    record_stream_parity(
        "heartbeat_silence", len(want_resumed) + len(required), ok
    )
    assert ok, (
        f"resumed got={len(got_resumed)} want={len(want_resumed)}; "
        f"open got={len(got_open)} cand={len(candidates)} "
        f"req={len(required)}"
    )


def test_json_drift_stream_matches_batch_profile(spark, sf_dir, tmp_path):
    """Twin #33: per closed daily window, novel (path, type) counts
    equal the batch py_json_paths replay minus the frozen baseline;
    emitted window set == closed-window set."""
    import time

    from data_export_tool_spark.operators.jsonprof import py_json_paths
    from data_export_tool_spark.streaming.events import json_drift_stream

    ev = Catalog(spark, sf_dir).load("events").where(
        F.col("ts").isNotNull() & F.col("props").isNotNull()
    )
    # payload evolution: a third of users start shipping a v2 field,
    # a fifth switch k to a string — both novel vs the baseline
    evolved = ev.withColumn(
        "props",
        F.when(
            F.pmod(F.col("user_id"), F.lit(3)) == 0,
            F.regexp_replace(F.col("props"), r"\}$", ', "v2": "x"}'),
        )
        .when(
            F.pmod(F.col("user_id"), F.lit(5)) == 0,
            F.lit('{"k": "stringy"}'),
        )
        .otherwise(F.col("props")),
    )
    bounds = evolved.select(F.unix_millis("ts").alias("ms")).approxQuantile(
        "ms", [0.5], 0.0
    )
    drop_dir = str(tmp_path / "jd_drops")
    lo = None
    for hi in [*bounds, None]:
        sel = evolved
        if lo is not None:
            sel = sel.where(F.unix_millis("ts") >= lo)
        if hi is not None:
            sel = sel.where(F.unix_millis("ts") < hi)
        sel.repartition(1).write.mode("append").parquet(drop_dir)
        lo = hi
        time.sleep(1.05)

    BASE = [("$", "object"), ("$.k", "integer")]
    stream = read_events_stream(spark, drop_dir, max_files_per_trigger=1)
    out = json_drift_stream(
        stream, BASE, window="1 day", watermark="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("json_drift_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["path"], r["json_type"]): r["n"]
        for r in spark.sql("SELECT * FROM json_drift_test").collect()
    }

    import datetime as _dt

    rows = spark.read.parquet(drop_dir).select("ts", "props").collect()
    max_ts = max(r["ts"] for r in rows)
    wm = max_ts - _dt.timedelta(minutes=30)
    want: dict = {}
    base = set(BASE)
    for r in rows:
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        end = day + _dt.timedelta(days=1)
        if end > wm:
            continue  # window not closed at final watermark
        for p, t, _ex in py_json_paths(r["props"], 4):
            if (p, t) in base:
                continue
            key = (day, p, t)
            want[key] = want.get(key, 0) + 1
    ok = got == want and len(want) > 10
    # both evolution modes must appear
    ok = ok and any(k[1] == "$.v2" for k in want)
    ok = ok and any(k[1] == "$.k" and k[2] == "string" for k in want)
    record_stream_parity("json_schema_drift", len(want), ok)
    assert ok, f"got={len(got)} want={len(want)}"

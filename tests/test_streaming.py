"""Structured Streaming tests: the streaming pipelines must agree with
their oracle-checked batch twins (queries.events_q)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
)


@pytest.fixture(scope="module")
def event_drop_dir(spark, sf_dir, tmp_path_factory):
    """Re-stage the events table as multiple parquet 'drops' so the
    file stream has several micro-batches to chew through."""
    out = str(tmp_path_factory.mktemp("event_drops"))
    ev = Catalog(spark, sf_dir).load("events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


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
    ev = spark.read.parquet(event_drop_dir)
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
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
    assert got == expected


def test_sessionize_stream_runs(spark, event_drop_dir, tmp_path):
    """applyInPandasWithState sessionization: runs end-to-end and emits
    closed sessions with sane invariants (exact parity with the batch
    twin needs event-time timeouts; processing-time closes remaining
    sessions only on later triggers)."""
    from data_export_tool_spark.streaming.events import sessionize_stream

    stream = read_events_stream(spark, event_drop_dir, max_files_per_trigger=8)
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
    got = spark.read.parquet(out_dir)
    rows = got.collect()
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1

"""Accuracy/semantics pins for the sketch and CDC-upsert operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.sketch import (
    approx_distinct,
    approx_quantiles,
    exact_quantiles,
)
from data_export_tool_spark.operators.upsert import merge_upsert


def test_approx_distinct_within_rsd(spark):
    df = spark.range(100_000).select(
        (F.col("id") % 20_000).alias("k"), (F.col("id") % 7).alias("g")
    )
    got = approx_distinct(df, "k", rsd=0.02).first()[0]
    assert abs(got - 20_000) / 20_000 < 0.06  # 3 sigma of rsd=0.02
    per_group = {
        r.g: r.approx_distinct_k
        for r in approx_distinct(df, "k", by=["g"], rsd=0.02).collect()
    }
    assert set(per_group) == set(range(7))
    for g, est in per_group.items():
        exact = df.filter(F.col("g") == g).select("k").distinct().count()
        assert abs(est - exact) / exact < 0.06


def test_approx_quantiles_rank_error(spark):
    n = 50_000
    df = spark.range(n).select(F.col("id").cast("double").alias("x"))
    probs = (0.25, 0.5, 0.9)
    got = approx_quantiles(df, "x", probs, relative_error=0.001).first()[0]
    for p, est in zip(probs, got):
        # GK guarantee: returned element's rank within eps*N of target
        assert abs(est - p * (n - 1)) <= 0.001 * n + 1


def test_exact_quantiles_interpolates(spark):
    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], "x double")
    q = df.agg(exact_quantiles("x", (0.5,))[0].alias("m")).first().m
    assert q == 2.5  # PERCENTILE_CONT linear interpolation, not nearest


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 21), (9, "z", 90)], "k long, s string, v long"
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10), 2: ("B", 21), 3: ("c", 30), 9: ("z", 90)}


def test_merge_upsert_order_by_picks_newest(spark):
    target = spark.createDataFrame([(1, 5, "old")], "k long, seq long, s string")
    updates = spark.createDataFrame(
        [(1, 3, "stale"), (1, 7, "new")], "k long, seq long, s string"
    )
    got = merge_upsert(target, updates, ["k"], order_by=["seq"]).collect()
    assert [(r.k, r.seq, r.s) for r in got] == [(1, 7, "new")]
    # a stale changeset must NOT beat a newer target row
    got2 = merge_upsert(
        spark.createDataFrame([(1, 9, "target-newest")], "k long, seq long, s string"),
        updates,
        ["k"],
        order_by=["seq"],
    ).collect()
    assert got2[0].s == "target-newest"


def test_merge_upsert_rejects_schema_drift(spark):
    target = spark.createDataFrame([(1, "a")], "k long, s string")
    updates = spark.createDataFrame([(1, "a", 2)], "k long, s string, extra long")
    with pytest.raises(ValueError, match="column mismatch"):
        merge_upsert(target, updates, ["k"])

"""Resample / gap-fill (operators/timeseries.py) vs DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from tests.conftest import record_opcheck
from data_export_tool_spark.operators.timeseries import fill_gaps, resample


def test_resample_matches_duckdb(spark, sf_dir):
    ev = Catalog(spark, sf_dir).load("events")
    got = {
        (r["event_type"], str(r["bucket_start"])[:10]): (r["n"], round(r["v"], 6))
        for r in resample(
            ev,
            "1 day",
            {
                "n": F.count(F.lit(1)),
                "v": F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
                ),
            },
            keys=["event_type"],
        ).collect()
    }
    want = {
        (t, str(b)[:10]): (int(n), round(float(v), 6))
        for t, b, n, v in duckdb.sql(
            f"""
    SELECT event_type, date_trunc('day', ts) AS b,
           count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
    FROM read_parquet('{sf_dir}/events.parquet')
    WHERE ts IS NOT NULL GROUP BY 1, 2
    """
        ).fetchall()
    }
    record_opcheck("timeseries_resample", len(want), got == want)
    assert got == want


def test_fill_gaps_dense_axis_and_locf(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 3, 1, h, 0, 0)
    rows = [
        ("a", t(0), 10.0),
        ("a", t(1), 11.0),
        # gap: hours 2-3 missing
        ("a", t(4), 14.0),
        ("b", t(2), 20.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    res = resample(
        df, "1 hour", {"n": F.count(F.lit(1)), "v": F.max("value")}, keys=["k"]
    )
    dense = fill_gaps(
        res, 3600, keys=["k"], locf_cols=["v"]
    ).orderBy("k", "bucket_start")
    got = [
        (r["k"], r["bucket_start"].hour, r["n"], r["v"], r["is_gap"])
        for r in dense.collect()
    ]
    assert got == [
        ("a", 0, 1, 10.0, False),
        ("a", 1, 1, 11.0, False),
        ("a", 2, None, 11.0, True),   # synthesized; v carried forward
        ("a", 3, None, 11.0, True),
        ("a", 4, 1, 14.0, False),
        ("b", 2, 1, 20.0, False),     # single-bucket key: no gaps
    ]
    # count column NOT in locf_cols stays NULL on gaps (honest zero via
    # coalesce at read time), while the gauge carries forward
    assert dense.where(F.col("is_gap") & F.col("n").isNotNull()).count() == 0


def test_fill_gaps_matches_duckdb_axis(spark, sf_dir):
    ev = Catalog(spark, sf_dir).load("events")
    res = resample(ev, "1 day", {"n": F.count(F.lit(1))}, keys=["event_type"])
    dense = fill_gaps(res, 86400, keys=["event_type"])
    got_axis = {
        (r["event_type"], str(r["bucket_start"])[:10]) for r in dense.collect()
    }
    want_axis = {
        (t, str(b)[:10])
        for t, b in duckdb.sql(
            f"""
    WITH res AS (
      SELECT event_type, date_trunc('day', ts) AS b
      FROM read_parquet('{sf_dir}/events.parquet') WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(b) lo, max(b) hi FROM res GROUP BY 1
    )
    SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS b
    FROM bounds
    """
        ).fetchall()
    }
    record_opcheck("timeseries_fill_gaps", len(want_axis), got_axis == want_axis)
    assert got_axis == want_axis
    # every original bucket present and not flagged as gap
    n_real = dense.where(~F.col("is_gap")).count()
    assert n_real == res.count()

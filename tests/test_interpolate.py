"""Linear interpolation (operators/timeseries.py interpolate_linear):
hand laws, python replay on a gappy real rollup, timestamp grain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.timeseries import (
    fill_gaps,
    interpolate_linear,
    resample,
)


def test_interpolate_hand_case(spark):
    rows = [
        ("k", 0, 10.0), ("k", 1, None), ("k", 2, None), ("k", 3, None),
        ("k", 4, 20.0), ("k", 5, None),  # trailing NULL: no extrapolation
        ("j", 0, None), ("j", 1, 5.0),   # leading NULL: no extrapolation
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        (r["k"], r["t"]): r["v_interp"]
        for r in interpolate_linear(
            df, ["v"], keys=["k"], order_col="t"
        ).collect()
    }
    assert got[("k", 0)] == 10.0
    assert got[("k", 1)] == pytest.approx(12.5)
    assert got[("k", 2)] == pytest.approx(15.0)
    assert got[("k", 3)] == pytest.approx(17.5)
    assert got[("k", 4)] == 20.0
    assert got[("k", 5)] is None
    assert got[("j", 0)] is None
    assert got[("j", 1)] == 5.0


def test_interpolate_irregular_spacing(spark):
    # non-uniform order positions weight by DISTANCE, not row count
    rows = [("k", 0, 0.0), ("k", 10, None), ("k", 40, 40.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        r["t"]: r["v_interp"]
        for r in interpolate_linear(df, ["v"], ["k"], "t").collect()
    }
    assert got[10] == pytest.approx(10.0)


def test_interpolate_real_rollup_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "cast(ts as timestamp) ts", "event_type", "value"
    )
    hourly = resample(
        ev.where(F.col("event_type") == "purchase"),
        "1 hour",
        {"v": F.avg("value")},
        keys=["event_type"],
    )
    grid = fill_gaps(hourly, 3600, keys=["event_type"])
    out = interpolate_linear(
        grid, ["v"], keys=["event_type"], order_col="bucket_start"
    ).collect()
    # python replay over the ordered series
    series = sorted(
        ((r["bucket_start"], r["v"], r["v_interp"]) for r in out),
        key=lambda x: x[0],
    )
    xs = [s[0].timestamp() for s in series]
    vs = [s[1] for s in series]
    want = []
    for i in range(len(series)):
        if vs[i] is not None:
            want.append(vs[i])
            continue
        prev = next(
            ((xs[j], vs[j]) for j in range(i - 1, -1, -1)
             if vs[j] is not None), None
        )
        nxt = next(
            ((xs[j], vs[j]) for j in range(i + 1, len(series))
             if vs[j] is not None), None
        )
        if prev is None or nxt is None:
            want.append(None)
        else:
            (x0, v0), (x1, v1) = prev, nxt
            want.append(v0 + (v1 - v0) * (xs[i] - x0) / (x1 - x0))
    n_interp = 0
    for (b, v, vi), wv in zip(series, want):
        if wv is None:
            assert vi is None
        else:
            assert vi == pytest.approx(wv, rel=1e-9)
            if v is None:
                n_interp += 1
    assert n_interp > 0  # the rollup actually had gaps
    from tests.conftest import record_opcheck

    record_opcheck(
        "interpolate_linear", len(want), True,
        oracle="python-reference", value=float(n_interp),
    )


def test_interpolate_validation(spark):
    df = spark.createDataFrame([("k", 1, 1.0)], "k string, t int, v double")
    with pytest.raises(ValueError, match="value_cols"):
        interpolate_linear(df, [], ["k"], "t")

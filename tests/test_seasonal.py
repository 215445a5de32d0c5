"""Classical seasonal decomposition (operators/timeseries.py
seasonal_decompose): exact python replay + planted-pattern recovery."""

from __future__ import annotations

import math
import random

import pytest

from data_export_tool_spark.operators.timeseries import seasonal_decompose


def _py_decompose(vals, period):
    """Replay: centered (2x)m MA trend, phase means of detrended,
    centered seasonal, resid."""
    n = len(vals)
    h = period // 2
    trend = [None] * n
    for i in range(n):
        if i - h < 0 or i + h >= n:
            continue
        if period % 2 == 0:
            window = vals[i - h : i + h + 1]
            if any(v is None for v in window):
                continue
            trend[i] = (sum(window) - 0.5 * window[0] - 0.5 * window[-1]) / period
        else:
            window = vals[i - h : i + h + 1]
            if any(v is None for v in window):
                continue
            trend[i] = sum(window) / len(window)
    phase_means = {}
    for i, v in enumerate(vals):
        if trend[i] is not None and v is not None:
            phase_means.setdefault(i % period, []).append(v - trend[i])
    pm = {p: sum(d) / len(d) for p, d in phase_means.items()}
    center = sum(pm.values()) / len(pm)
    seasonal = {p: m - center for p, m in pm.items()}
    return trend, seasonal


def _series(seed=59, n=120, period=12):
    rng = random.Random(seed)
    pattern = [math.sin(2 * math.pi * p / period) * 5 for p in range(period)]
    vals = [
        10.0 + 0.1 * i + pattern[i % period] + rng.gauss(0, 0.3)
        for i in range(n)
    ]
    return vals, pattern


def test_seasonal_decompose_matches_replay_and_recovers_pattern(spark):
    period = 12
    vals, pattern = _series(period=period)
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    out = {
        r["t"]: r
        for r in seasonal_decompose(
            df, period, "y", order_col="t", keys=["key"]
        ).collect()
    }
    trend_ref, seasonal_ref = _py_decompose(vals, period)
    assert len(out) == len(vals)
    for i in range(len(vals)):
        r = out[i]
        assert r["phase"] == i % period
        if trend_ref[i] is None:
            assert r["trend"] is None and r["resid"] is None
        else:
            assert r["trend"] == pytest.approx(trend_ref[i], rel=1e-9)
            assert r["resid"] == pytest.approx(
                vals[i] - trend_ref[i] - seasonal_ref[i % period], abs=1e-9
            )
        assert r["seasonal"] == pytest.approx(
            seasonal_ref[i % period], rel=1e-9, abs=1e-12
        )
    # seasonal identifiability: sums to ~0 over one period
    assert sum(seasonal_ref.values()) == pytest.approx(0.0, abs=1e-9)
    # planted sine pattern recovered (centered pattern vs estimate)
    c = sum(pattern) / len(pattern)
    for p in range(period):
        assert out[p]["seasonal"] == pytest.approx(
            pattern[p] - c, abs=0.35
        )
    from tests.conftest import record_opcheck

    record_opcheck(
        "seasonal_decompose", len(vals), True, oracle="python-reference",
        value=max(abs(v) for v in seasonal_ref.values()),
    )


def test_seasonal_decompose_odd_period_and_multikey(spark):
    period = 7
    va, _ = _series(seed=61, n=70, period=period)
    vb, _ = _series(seed=67, n=70, period=period)
    rows = [("a", i, v) for i, v in enumerate(va)] + [
        ("b", i, v) for i, v in enumerate(vb)
    ]
    df = spark.createDataFrame(rows, "key string, t int, y double")
    got = seasonal_decompose(df, period, "y", order_col="t", keys=["key"])
    by_key = {}
    for r in got.collect():
        by_key.setdefault(r["key"], {})[r["t"]] = r
    for key, vals in (("a", va), ("b", vb)):
        trend_ref, seasonal_ref = _py_decompose(vals, period)
        for i in (10, 35, 60):
            assert by_key[key][i]["trend"] == pytest.approx(
                trend_ref[i], rel=1e-9
            )
            assert by_key[key][i]["seasonal"] == pytest.approx(
                seasonal_ref[i % period], rel=1e-9
            )
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, 1, "y", order_col="t", keys=["key"])

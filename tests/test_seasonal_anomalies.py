"""Seasonality-aware anomalies (operators/timeseries.py
seasonal_anomalies): the spike-vs-peak law, python MAD-on-resid
replay, edge NULL contract."""

from __future__ import annotations

import math
import statistics

import pytest

from data_export_tool_spark.operators.robust import mad_outliers
from data_export_tool_spark.operators.timeseries import (
    seasonal_anomalies,
)

PERIOD = 12
N = 8 * PERIOD
SPIKES = {40: 12.0, 70: -12.0}


def _series(key="k"):
    rows = []
    for i in range(N):
        v = 10.0 + 0.05 * i + 8.0 * math.sin(2 * math.pi * i / PERIOD)
        # deterministic pseudo-noise U(-1, 1): without a noise floor
        # the clean decomposition's MAD is ~0 and every numerical
        # echo of a spike explodes the robust z
        v += ((i * 2654435761) % 2000) / 1000.0 - 1.0
        v += SPIKES.get(i, 0.0)
        rows.append((key, i, v))
    return rows


def test_spike_vs_seasonal_peak_law(spark):
    df = spark.createDataFrame(_series(), "k string, t int, v double")
    flagged = {
        r["t"]
        for r in seasonal_anomalies(
            df, PERIOD, "v", order_col="t", keys=["k"], k=5.0
        ).collect()
        if r["is_outlier"]
    }
    # the injected spikes are caught...
    assert set(SPIKES) <= flagged
    # ...and every other flag is a spike ECHO: a large spike leaks
    # into the centered-MA trend and the phase means for its
    # neighborhood (intrinsic to classical decomposition), so flags
    # may ring within one season of a spike — but seasonal crests
    # far from any spike must stay unflagged
    near_spike = {
        t
        for s in SPIKES
        for t in range(s - PERIOD, s + PERIOD + 1)
    }
    assert flagged <= near_spike
    # seasonal crests far from any spike stay unflagged even though
    # they are the raw series' extremes — the law a raw-value MAD
    # cannot satisfy while still catching ±12 spikes under a ±8 wave
    crests = {t for t in range(N) if t % PERIOD == 3 and t not in near_spike}
    assert crests and not (crests & flagged)


def test_matches_python_mad_on_resid(spark):
    from data_export_tool_spark.operators.timeseries import (
        seasonal_decompose,
    )

    df = spark.createDataFrame(_series(), "k string, t int, v double")
    dec = seasonal_decompose(df, PERIOD, "v", order_col="t", keys=["k"])
    resids = {
        r["t"]: r["resid"] for r in dec.collect() if r["resid"] is not None
    }
    med = statistics.median(resids.values())
    mad = statistics.median(abs(x - med) for x in resids.values())
    want = {
        t: abs(0.6745 * (x - med) / mad) > 3.5 for t, x in resids.items()
    }
    got = {
        r["t"]: (r["is_outlier"], r["robust_z"])
        for r in seasonal_anomalies(
            df, PERIOD, "v", order_col="t", keys=["k"]
        ).collect()
    }
    for t, w in want.items():
        assert got[t][0] == w
        z = 0.6745 * (resids[t] - med) / mad  # signed, as documented
        # mad_outliers publishes robust_z rounded to 6 decimals
        assert got[t][1] == pytest.approx(z, abs=5e-7)
    # edge rows (NULL trend -> NULL resid) pass through unflagged
    edges = [t for t in range(N) if t not in resids]
    assert len(edges) == 2 * (PERIOD // 2)
    for t in edges:
        assert got[t][0] is None
    from tests.conftest import record_opcheck

    record_opcheck(
        "seasonal_anomalies", len(want), True,
        oracle="python-reference",
    )

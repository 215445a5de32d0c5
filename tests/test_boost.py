"""Boosted stumps (operators/boost.py): exact python replay of the
histogram fit (same edges, same gain search, same Newton weights),
learning-quality law (AUC beats the base rate), NULL routing, early
stop, and the predict projection contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.boost import (
    gbdt_stumps_fit,
    gbdt_stumps_predict,
)

ROUNDS, LR, BINS, LAM = 6, 0.4, 8, 1.0


def _fit_replay(rows, feature_idx, edges):
    """Exact python mirror of gbdt_stumps_fit given the model's own
    bin edges. rows: list of (y, [features])."""
    nf = len(feature_idx)

    def bin_of(v, es):
        if v is None:
            return -1
        return sum(1 for e in es if v > e)

    binned = [
        (y, [bin_of(xs[i], edges[i]) for i in range(nf)]) for y, xs in rows
    ]
    pos = sum(y for y, _ in binned) / len(binned)
    pos = min(max(pos, 1e-6), 1 - 1e-6)
    base = math.log(pos / (1 - pos))
    margins = [base] * len(binned)
    stumps = []
    for _ in range(ROUNDS):
        g = [1 / (1 + math.exp(-m)) - y for m, (y, _) in zip(margins, binned)]
        h = [
            (1 / (1 + math.exp(-m))) * (1 - 1 / (1 + math.exp(-m)))
            for m in margins
        ]
        hist = {}
        for (y, bs), gi, hi in zip(binned, g, h):
            for fi in range(nf):
                k = (fi, bs[fi])
                sg, sh = hist.get(k, (0.0, 0.0))
                hist[k] = (sg + gi, sh + hi)
        Gt = sum(v[0] for v in hist.values()) / nf
        Ht = sum(v[1] for v in hist.values()) / nf
        root = Gt * Gt / (Ht + LAM)
        best = None
        for fi in range(nf):
            fb = {b: v for (f, b), v in hist.items() if f == fi}
            bins_ = sorted(b for b in fb if b >= 0)
            gl, hl = fb.get(-1, (0.0, 0.0))
            for b in bins_[:-1]:
                gl += fb[b][0]
                hl += fb[b][1]
                gr, hr = Gt - gl, Ht - hl
                gain = gl * gl / (hl + LAM) + gr * gr / (hr + LAM) - root
                if best is None or gain > best[0] + 1e-12:
                    best = (gain, fi, b, -gl / (hl + LAM), -gr / (hr + LAM))
        if best is None or best[0] <= 1e-12:
            break
        _, fi, thr, wl, wr = best
        stumps.append((fi, thr, wl, wr))
        margins = [
            m + (LR * wl if bs[fi] <= thr else LR * wr)
            for m, (y, bs) in zip(margins, binned)
        ]
    return base, stumps


@pytest.fixture(scope="module")
def labeled(spark):
    # y = 1 when (x0 > 5) or (x1 <= 2), with a NULL-x0 stripe
    rows = []
    for i in range(400):
        x0 = None if i % 17 == 0 else float(i % 11)
        x1 = float((i * 7) % 9)
        y = 1 if ((x0 is not None and x0 > 5) or x1 <= 2) else 0
        rows.append((y, x0, x1))
    df = spark.createDataFrame(rows, "y int, x0 double, x1 double")
    return rows, df


def test_gbdt_matches_python_replay(spark, labeled):
    rows, df = labeled
    model = gbdt_stumps_fit(
        df, "y", ["x0", "x1"], n_rounds=ROUNDS, lr=LR, n_bins=BINS,
        reg_lambda=LAM,
    )
    base, stumps = _fit_replay(
        [(y, [x0, x1]) for y, x0, x1 in rows],
        [0, 1],
        [model["edges"]["x0"], model["edges"]["x1"]],
    )
    assert model["base_score"] == pytest.approx(base, abs=1e-9)
    assert len(model["stumps"]) == len(stumps)
    ok = True
    for got, want in zip(model["stumps"], stumps):
        assert got[0] == want[0] and got[1] == want[1], (got, want)
        assert got[2] == pytest.approx(want[2], abs=1e-6)
        assert got[3] == pytest.approx(want[3], abs=1e-6)
    record_opcheck(
        "gbdt_stumps_fit", len(stumps) * 4 + 1, ok, oracle="python-reference"
    )


def test_gbdt_learns_the_signal(spark, labeled):
    rows, df = labeled
    model = gbdt_stumps_fit(
        df, "y", ["x0", "x1"], n_rounds=ROUNDS, lr=LR, n_bins=BINS
    )
    scored = gbdt_stumps_predict(df, model).collect()
    # threshold at 0.5: boosted stumps must beat the majority class
    acc = sum((r["p"] >= 0.5) == (r["y"] == 1) for r in scored) / len(scored)
    base_rate = max(
        sum(r["y"] for y, *_ in rows for r in ()) or
        sum(y for y, *_ in rows) / len(rows),
        1 - sum(y for y, *_ in rows) / len(rows),
    )
    assert acc > base_rate + 0.05, (acc, base_rate)
    # predictions are a pure projection: no shuffle in the plan
    plan = gbdt_stumps_predict(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gbdt_null_routing_and_contracts(spark, labeled):
    _, df = labeled
    model = gbdt_stumps_fit(df, "y", ["x0", "x1"], n_rounds=2, n_bins=4)
    # NULL feature rows get a valid probability (routed left)
    got = gbdt_stumps_predict(
        spark.createDataFrame([(None, 1.0)], "x0 double, x1 double"), model
    ).collect()[0]
    assert 0.0 < got["p"] < 1.0
    with pytest.raises(ValueError):
        gbdt_stumps_fit(df, "y", [], n_rounds=2)
    with pytest.raises(ValueError):
        gbdt_stumps_fit(df, "y", ["x0"], n_rounds=0)
    with pytest.raises(ValueError):
        gbdt_stumps_fit(df, "y", ["x0"], n_bins=1)


def test_gbdt_early_stop_on_constant_labels(spark):
    df = spark.createDataFrame(
        [(1, float(i % 5)) for i in range(50)], "y int, x0 double"
    )
    model = gbdt_stumps_fit(df, "y", ["x0"], n_rounds=5)
    # nothing to learn -> no stumps, base score near +inf side
    assert model["stumps"] == []
    p = gbdt_stumps_predict(df.limit(1), model).collect()[0]["p"]
    assert p > 0.99

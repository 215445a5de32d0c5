"""Cox proportional hazards (operators/survival.py cox_ph): exact
python replay of the Newton machinery, planted-hazard recovery, and
the score-test == log-rank cross-operator law."""

from __future__ import annotations

import math
import random

import pytest

from data_export_tool_spark.operators.survival import (
    cox_ph,
    cox_predict,
    logrank_test,
    py_cox_fold,
)


def _planted(seed=47, n=3000, beta=(0.8, -0.5)):
    """Exponential hazards λ·exp(x·β), uniform censoring."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        x = [rng.random(), rng.random()]
        lam = 0.1 * math.exp(beta[0] * x[0] + beta[1] * x[1])
        t_event = rng.expovariate(lam)
        t_cens = rng.uniform(0, 30)
        t = min(t_event, t_cens)
        e = 1 if t_event <= t_cens else 0
        rows.append((round(t, 6), e, x))
    return rows


def _py_cox_partials(rows, beta, d):
    """Python replay of one _cox_partials aggregation (time grain)."""
    acc = {}
    for t, e, x in rows:
        lin = sum(b * xi for b, xi in zip(beta, x))
        lin = max(-50.0, min(50.0, lin))
        w = math.exp(lin)
        r = acc.setdefault(
            t,
            {
                "t": t,
                "d_t": 0,
                "sw": 0.0,
                **{f"sx_{i}": 0.0 for i in range(d)},
                **{f"swx_{i}": 0.0 for i in range(d)},
                **{
                    f"swxx_{i}_{j}": 0.0
                    for i in range(d)
                    for j in range(i, d)
                },
            },
        )
        r["d_t"] += e
        r["sw"] += w
        for i in range(d):
            if e:
                r[f"sx_{i}"] += x[i]
            r[f"swx_{i}"] += w * x[i]
            for j in range(i, d):
                r[f"swxx_{i}_{j}"] += w * x[i] * x[j]
    return list(acc.values())


def _py_cox_fit(rows, d, iters=20, tol=1e-9, ridge=1e-8):
    import numpy as np

    beta = np.zeros(d)
    ll_prev = None
    for _ in range(iters):
        parts = _py_cox_partials(rows, beta.tolist(), d)
        ll, U, info = py_cox_fold(parts, beta, d)
        beta = beta + np.linalg.solve(info + ridge * np.eye(d), U)
        if ll_prev is not None and abs(ll - ll_prev) < tol:
            break
        ll_prev = ll
    parts = _py_cox_partials(rows, beta.tolist(), d)
    ll, _, info = py_cox_fold(parts, beta, d)
    return beta, ll, info


def test_cox_matches_python_replay_and_recovers_beta(spark):
    rows = _planted()
    df = spark.createDataFrame(rows, "t double, e int, x array<double>")
    model = cox_ph(df, "t", "e", "x")
    beta_ref, ll_ref, _ = _py_cox_fit(rows, 2)
    assert model["coef"][0] == pytest.approx(beta_ref[0], rel=1e-6)
    assert model["coef"][1] == pytest.approx(beta_ref[1], rel=1e-6)
    assert model["loglik"] == pytest.approx(ll_ref, rel=1e-9)
    # planted hazards recovered within sampling error (~2 SE)
    assert model["coef"][0] == pytest.approx(0.8, abs=3 * model["se"][0])
    assert model["coef"][1] == pytest.approx(-0.5, abs=3 * model["se"][1])
    assert abs(model["coef"][0] - 0.8) < 0.25
    assert abs(model["coef"][1] + 0.5) < 0.25
    assert model["hazard_ratio"][0] == pytest.approx(
        math.exp(model["coef"][0]), rel=1e-12
    )
    assert model["n"] == len(rows)
    assert model["n_events"] == sum(e for _, e, _ in rows)
    from tests.conftest import record_opcheck

    record_opcheck(
        "cox_ph", len(rows), True, oracle="python-reference",
        value=model["coef"][0],
    )


def test_cox_score_test_equals_logrank_without_ties(spark):
    """With one binary covariate and NO tied durations, the Cox score
    test at β=0 (U²/I) is EXACTLY the log-rank χ² — the classic
    identity tying the two operators together."""
    rng = random.Random(53)
    rows = []
    taken = set()
    for i in range(400):
        g = i % 2
        lam = 0.1 * (2.0 if g else 1.0)
        while True:
            t_event = rng.expovariate(lam)
            t_cens = rng.uniform(0, 25)
            t = round(min(t_event, t_cens), 9)
            if t not in taken:  # enforce no ties
                taken.add(t)
                break
        e = 1 if t_event <= t_cens else 0
        rows.append((t, e, [float(g)], "B" if g else "A"))
    df = spark.createDataFrame(
        rows, "t double, e int, x array<double>, grp string"
    )
    parts = _py_cox_partials([(t, e, x) for t, e, x, _ in rows], [0.0], 1)
    _, U, info = py_cox_fold(parts, [0.0], 1)
    score_chi2 = float(U[0] ** 2 / info[0, 0])
    lr = logrank_test(df, "t", "e", "grp").first()
    assert score_chi2 == pytest.approx(lr["chi2"], rel=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "cox_score_logrank_identity", len(rows), True,
        oracle="cross-operator", value=score_chi2,
    )


def test_cox_predict_is_pure_projection(spark):
    rows = _planted(n=200)
    df = spark.createDataFrame(rows, "t double, e int, x array<double>")
    model = {"coef": [0.5, -1.0]}
    got = cox_predict(df, model, "x").select("x", "partial_hazard").collect()
    for r in got:
        lin = 0.5 * r["x"][0] - 1.0 * r["x"][1]
        assert r["partial_hazard"] == pytest.approx(math.exp(lin), rel=1e-12)


def test_cox_validation(spark):
    df = spark.createDataFrame(
        [(1.0, 0, [0.1])], "t double, e int, x array<double>"
    )
    with pytest.raises(ValueError, match="no events"):
        cox_ph(df, "t", "e", "x")
    with pytest.raises(ValueError, match="max_times"):
        cox_ph(
            spark.createDataFrame(
                [(1.0, 1, [0.1]), (2.0, 1, [0.2])],
                "t double, e int, x array<double>",
            ),
            "t", "e", "x", max_times=1,
        )
    with pytest.raises(ValueError, match="no usable"):
        cox_ph(df.where("t > 5"), "t", "e", "x")

"""Isolation forest (operators/iforest.py): exact python replay of
the deterministic sample → trees → scores chain, the
anomaly-separates law, NULL routing, and validation."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.iforest import (
    _c,
    _splitmix,
    iforest_fit,
    iforest_score,
)

SEP = "␟"
TREES, PSI, SEED = 8, 32, 7


def _replay_fit(rows):
    """Pure-python mirror of iforest_fit for 2-feature integer-valued
    rows (whose double→string cast matches python str())."""
    import numpy as np

    def key(r):
        s = SEP.join(str(float(v)) for v in r)
        return (hashlib.md5(s.encode()).hexdigest(), float(r[0]), float(r[1]))

    ordered = sorted(rows, key=key)[: TREES * PSI]
    X = np.array(ordered, dtype="float64")
    psi = min(PSI, len(X))
    max_depth = max(1, int(math.ceil(math.log2(psi))))
    rng = _splitmix(SEED)

    def build(Xs):
        n_nodes = 2 ** (max_depth + 1) - 1
        feat = [-1] * n_nodes
        thr = [0.0] * n_nodes
        size = [0] * n_nodes

        def go(node, idx, depth):
            size[node] = len(idx)
            if depth >= max_depth or len(idx) <= 1:
                return
            sub = Xs[idx]
            lo, hi = sub.min(0), sub.max(0)
            split = [j for j in range(Xs.shape[1]) if hi[j] > lo[j]]
            if not split:
                return
            j = split[int(rng() * len(split)) % len(split)]
            t = lo[j] + rng() * (hi[j] - lo[j])
            feat[node], thr[node] = j, float(t)
            mask = sub[:, j] <= t
            go(2 * node + 1, idx[np.where(mask)[0]], depth + 1)
            go(2 * node + 2, idx[np.where(~mask)[0]], depth + 1)

        go(0, np.arange(len(Xs)), 0)
        return {"feature": feat, "threshold": thr, "size": size}

    trees = []
    for t in range(TREES):
        lo = (t * psi) % len(X)
        sl = X[lo : lo + psi]
        if len(sl) < psi:
            sl = np.vstack([sl, X[: psi - len(sl)]])
        trees.append(build(sl))
    return {"psi": psi, "max_depth": max_depth, "trees": trees}


def _replay_score(model, row):
    total = 0.0
    for t in model["trees"]:
        node, depth = 0, 0
        while True:
            f = t["feature"][node]
            if f < 0 or depth >= model["max_depth"]:
                total += depth + _c(int(t["size"][node]))
                break
            v = row[f]
            left = v is None or (not (v > t["threshold"][node]))
            node = 2 * node + 1 if left else 2 * node + 2
            depth += 1
    avg = total / len(model["trees"])
    cn = _c(model["psi"])
    return 2.0 ** (-avg / cn) if cn > 0 else 1.0


@pytest.fixture(scope="module")
def data(spark):
    # a continuous-valued cluster (distinct points — iForest on
    # heavily-duplicated discrete data degenerates to big tied leaves,
    # washing out depth differences: faithful algorithm behavior, bad
    # test data) + a handful of far outliers
    rows = [
        (((i * 37) % 1000) / 100.0, ((i * 53) % 1000) / 100.0)
        for i in range(400)
    ]
    rows += [(500.0, 500.0), (-400.0, 300.0), (999.0, -999.0)]
    df = spark.createDataFrame(rows, "x0 double, x1 double")
    return rows, df


def test_iforest_matches_python_replay(spark, data):
    rows, df = data
    model = iforest_fit(df, ["x0", "x1"], n_trees=TREES, subsample=PSI, seed=SEED)
    want = _replay_fit(rows)
    assert model["psi"] == want["psi"]
    assert model["max_depth"] == want["max_depth"]
    ok = True
    for g, w in zip(model["trees"], want["trees"]):
        assert g["feature"] == w["feature"]
        assert g["size"] == w["size"]
        for a, b in zip(g["threshold"], w["threshold"]):
            assert a == pytest.approx(b, abs=1e-12)
    # scores replay row-for-row
    scored = iforest_score(df, model).collect()
    for r in scored[:50] + scored[-3:]:
        want_s = _replay_score(model, (r["x0"], r["x1"]))
        assert r["anomaly_score"] == pytest.approx(want_s, abs=1e-6)
        ok = ok and abs(r["anomaly_score"] - want_s) < 1e-6
    record_opcheck(
        "iforest_scores", 53 + len(model["trees"]), ok, oracle="python-reference"
    )


def test_iforest_flags_the_outliers(spark, data):
    rows, df = data
    model = iforest_fit(df, ["x0", "x1"], n_trees=TREES, subsample=PSI, seed=SEED)
    scored = iforest_score(df, model).collect()
    inlier = [r["anomaly_score"] for r in scored if abs(r["x0"]) <= 10]
    outlier = [r["anomaly_score"] for r in scored if abs(r["x0"]) > 10]
    assert outlier and inlier
    # every outlier scores above the inlier mean; mean gap is wide
    m_in = sum(inlier) / len(inlier)
    assert all(o > m_in for o in outlier)
    assert (sum(outlier) / len(outlier)) - m_in > 0.1


def test_iforest_null_and_validation(spark, data):
    _, df = data
    model = iforest_fit(df, ["x0", "x1"], n_trees=4, subsample=16)
    got = iforest_score(
        spark.createDataFrame([(None, None)], "x0 double, x1 double"), model
    ).collect()[0]
    assert 0.0 < got["anomaly_score"] <= 1.0
    with pytest.raises(ValueError):
        iforest_fit(df, [], n_trees=4)
    with pytest.raises(ValueError):
        iforest_fit(df, ["x0"], n_trees=0)
    with pytest.raises(ValueError):
        iforest_fit(df, ["x0"], subsample=1)

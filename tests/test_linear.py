"""Distributed linear models vs exact numpy replays: ridge against the
closed-form normal-equation solve, logistic against a step-by-step IRLS
replay with the identical clamp/penalty/stop rules, prediction against
driver-side dot products, plus the label/NULL exclusion contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.linear import (
    linear_predict,
    logreg_fit,
    logreg_predict,
    ridge_fit,
    ridge_fit_grouped,
)

REG = 1e-2


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _collected(emb, binary: bool):
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows], dtype="float64")
    if binary:
        y = (2.0 * X[:, 0] - X[:, 3] > 0.1).astype("float64")
    else:
        y = np.array([r["label"] for r in rows], dtype="float64")
    return X, y


def test_ridge_fit_matches_closed_form(spark, emb):
    # exact linear target: recovery + R²≈1 sanity AND moment-for-moment
    # numpy replay of the regularized closed form
    df = emb.withColumn(
        "target",
        2.0 * F.col("embedding")[0] - 3.0 * F.col("embedding")[3] + 0.5,
    )
    model = ridge_fit(df, "target", reg=REG)

    X, _ = _collected(emb, binary=False)
    y = 2.0 * X[:, 0] - 3.0 * X[:, 3] + 0.5
    d = X.shape[1]
    Xa = np.hstack([X, np.ones((len(X), 1))])
    A = Xa.T @ Xa + np.diag([REG] * d + [0.0])
    w = np.linalg.solve(A, Xa.T @ y)

    ok = (
        model["n"] == len(X)
        and np.allclose(model["weights"], w[:d], atol=1e-8)
        and np.allclose(model["intercept"], w[d], atol=1e-8)
        and model["r2"] > 0.999
    )
    record_opcheck(
        "ridge_fit", d + 1, bool(ok), oracle="python-reference",
        value=float(model["r2"]),
    )
    assert ok

    # prediction column replays the driver-side dot product exactly
    got = {
        r["vec_id"]: r["pred"]
        for r in linear_predict(emb, model).select("vec_id", "pred").collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = Xa @ w
    for i, vid in enumerate(ids):
        assert abs(got[vid] - want[i]) < 1e-9


def test_logreg_fit_matches_irls_replay(spark, emb):
    """tol=0 forces the full fixed iteration count, making the fit a
    deterministic function of the data — the numpy replay runs the
    same clamp, penalty, and update step for step. The target is a
    known linear boundary (the table's own label column is independent
    of the vectors), so the fit must also actually separate."""
    df = emb.withColumn(
        "y",
        (2.0 * F.col("embedding")[0] - F.col("embedding")[3] > 0.1).cast("int"),
    )
    iters = 6
    model = logreg_fit(df, "y", reg=REG, iters=iters, tol=0.0)

    X, y = _collected(emb, binary=True)
    d = X.shape[1]
    Xa = np.hstack([X, np.ones((len(X), 1))])
    pen = np.diag([REG] * d + [0.0])
    w = np.zeros(d + 1)
    loss = None
    for _ in range(iters):
        z = np.clip(Xa @ w, -35.0, 35.0)
        p = 1.0 / (1.0 + np.exp(-z))
        nll = float(np.sum(np.log1p(np.exp(-np.abs(z))) + z * (z > 0) - y * z))
        loss = (nll + 0.5 * REG * float(w[:d] @ w[:d])) / len(X)
        H = (Xa * (p * (1 - p))[:, None]).T @ Xa
        g = Xa.T @ (y - p) - pen @ w
        w = w + np.linalg.solve(H + pen, g)

    ok = (
        model["n"] == len(X)
        and model["iters_run"] == iters
        and np.allclose(model["weights"], w[:d], atol=1e-6)
        and abs(model["intercept"] - w[d]) < 1e-6
        and abs(model["loss"] - loss) < 1e-9
    )
    # classifier quality: the target is linearly separable by
    # construction, so trained accuracy must be near-perfect
    scored = logreg_predict(df, model).select("y", "p").collect()
    acc = float(np.mean([(r["p"] > 0.5) == bool(r["y"]) for r in scored]))
    record_opcheck(
        "logreg_fit", len(X), bool(ok and acc > 0.95),
        oracle="python-reference", value=acc,
    )
    assert ok
    assert acc > 0.95

    # probability column replays sigmoid(clip(x·w+b)) exactly
    got = {
        r["vec_id"]: r["p"]
        for r in logreg_predict(emb.withColumn("y", F.lit(0)), model)
        .select("vec_id", "p")
        .collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = 1.0 / (1.0 + np.exp(-np.clip(Xa @ np.array(model["weights"] + [model["intercept"]]), -35.0, 35.0)))
    for i, vid in enumerate(ids):
        assert abs(got[vid] - want[i]) < 1e-12


def test_label_and_vector_exclusion_contract(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1),
            (2, [0.0, 1.0], 0),
            (3, [1.0, 1.0], 2),      # non-binary label: logreg excludes
            (4, None, 1),            # NULL vector: both exclude
            (5, [], 1),              # empty vector: both exclude
            (6, [0.5, 0.5], None),   # NULL label: both exclude
            (7, [2.0, 0.0], 1),
            (8, [0.0, 2.0], 0),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    lm = logreg_fit(df, "label", reg=1.0, iters=2, tol=0.0)
    assert lm["n"] == 4  # ids 1, 2, 7, 8
    rm = ridge_fit(df, "label", reg=1.0)
    assert rm["n"] == 5  # label=2 is a fine regression target

    # wrong-dimension / NULL / empty vectors score as NULL
    out = {
        r["vec_id"]: r["p"]
        for r in logreg_predict(
            df.withColumn(
                "embedding",
                F.when(F.col("vec_id") == 3, F.array(F.lit(1.0))).otherwise(
                    F.col("embedding")
                ),
            ),
            lm,
        ).collect()
    }
    assert out[3] is None and out[4] is None and out[5] is None
    assert out[1] is not None and 0.0 < out[1] < 1.0


def test_validation_errors(spark, emb):
    empty = emb.where(F.lit(False)).withColumn("y", F.lit(1))
    with pytest.raises(ValueError):
        ridge_fit(emb.withColumn("y", F.lit(1.0)), "y", reg=-1.0)
    with pytest.raises(ValueError):
        logreg_fit(emb.withColumn("y", F.lit(1)), "y", iters=0)
    with pytest.raises(ValueError):
        ridge_fit(empty, "y")
    with pytest.raises(ValueError):
        logreg_fit(empty, "y")


def test_ridge_fit_grouped_matches_per_group_closed_form(spark, emb):
    df = emb.withColumn(
        "grp",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
            (F.col("vec_id") % 3).cast("string")
        ),
    ).withColumn(
        "target",
        2.0 * F.col("embedding")[0] - 3.0 * F.col("embedding")[3] + 0.5,
    )
    got = {
        r["grp"]: r
        for r in ridge_fit_grouped(df, "target", "grp", reg=REG).collect()
    }
    assert set(got) == {"0", "1", "2", None}

    rows = df.select("grp", "embedding", "target").collect()
    ok = True
    for g in got:
        sub = [r for r in rows if r["grp"] == g]
        X = np.array([r["embedding"] for r in sub], dtype="float64")
        y = np.array([r["target"] for r in sub], dtype="float64")
        d = X.shape[1]
        Xa = np.hstack([X, np.ones((len(X), 1))])
        w = np.linalg.solve(
            Xa.T @ Xa + np.diag([REG] * d + [0.0]), Xa.T @ y
        )
        ok = ok and (
            got[g]["n"] == len(sub)
            and np.allclose(got[g]["weights"], w[:d], atol=1e-8)
            and abs(got[g]["intercept"] - w[d]) < 1e-8
            and got[g]["r2"] > 0.999
        )
    record_opcheck(
        "ridge_fit_grouped", len(got), bool(ok), oracle="python-reference"
    )
    assert ok


def test_logreg_ovr_fit_and_scoring_replay(spark, emb):
    """OVR reuses the replay-pinned binary engine per class; what this
    pins is the multiclass layer: sorted class order, per-class
    negatives included, and the JVM argmax scoring replaying numpy's
    argmax over per-class sigmoid scores exactly."""
    from data_export_tool_spark.operators.linear import (
        logreg_fit_ovr,
        logreg_predict_ovr,
    )

    e = F.col("embedding")
    df = emb.withColumn(
        "cls",
        F.when(e[0] > F.greatest(e[1], e[2]), "a")
        .when(e[1] > e[2], "b")
        .otherwise("c"),
    )
    model = logreg_fit_ovr(df, "cls", reg=REG, iters=5, tol=0.0)
    assert model["classes"] == ["a", "b", "c"]
    n_total = emb.count()
    assert all(m["n"] == n_total for m in model["models"])

    X, _ = _collected(emb, binary=False)
    Xa = np.hstack([X, np.ones((len(X), 1))])
    P = np.column_stack(
        [
            1.0
            / (
                1.0
                + np.exp(
                    -np.clip(
                        Xa @ np.array(m["weights"] + [m["intercept"]]),
                        -35.0,
                        35.0,
                    )
                )
            )
            for m in model["models"]
        ]
    )
    want_lab = [model["classes"][i] for i in P.argmax(axis=1)]
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    scored = logreg_predict_ovr(df, model)
    got = {
        r["vec_id"]: (r["label_pred"], r["p_ovr"], r["cls"])
        for r in scored.select("vec_id", "label_pred", "p_ovr", "cls").collect()
    }
    ok = True
    correct = 0
    for i, vid in enumerate(ids):
        lab, p, true_cls = got[vid]
        ok = ok and lab == want_lab[i]
        ok = ok and np.allclose(p, P[i], atol=1e-12)
        correct += lab == true_cls
    acc = correct / len(ids)
    record_opcheck(
        "logreg_ovr", len(ids), bool(ok and acc > 0.8),
        oracle="python-reference", value=float(acc),
    )
    assert ok
    assert acc > 0.8


def test_ovr_tie_break_and_null_guard(spark):
    from data_export_tool_spark.operators.linear import logreg_predict_ovr

    # identical weights for classes y and z → identical probabilities
    # → the tie must break to the FIRST class in sorted order ("y")
    model = {
        "classes": ["x", "y", "z"],
        "models": [
            {"weights": [-1.0, 0.0], "intercept": 0.0},
            {"weights": [1.0, 0.0], "intercept": 0.0},
            {"weights": [1.0, 0.0], "intercept": 0.0},
        ],
    }
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["label_pred"], r["p_ovr"])
        for r in logreg_predict_ovr(df, model).collect()
    }
    assert got[1][0] == "y"
    assert got[2] == (None, None)
    assert got[3] == (None, None)  # ragged dim

    with pytest.raises(ValueError):
        from data_export_tool_spark.operators.linear import logreg_fit_ovr

        logreg_fit_ovr(
            spark.createDataFrame(
                [(1, [1.0], "only")], "id long, embedding array<double>, c string"
            ),
            "c",
        )


def test_logreg_fit_grouped_matches_global_fit_per_group(spark, emb):
    """Cross-implementation oracle: each group's applyInPandas IRLS
    must equal the (independently replay-pinned) distributed
    logreg_fit run on that group's subset — same data, same fixed
    iteration count, so weights agree to numerical tolerance."""
    from data_export_tool_spark.operators.linear import logreg_fit_grouped

    df = emb.withColumn(
        "grp",
        F.when(F.col("vec_id") % 11 == 0, F.lit(None)).otherwise(
            (F.col("vec_id") % 3).cast("string")
        ),
    ).withColumn(
        "y",
        (2.0 * F.col("embedding")[0] - F.col("embedding")[3] > 0.1).cast("int"),
    )
    got = {
        r["grp"]: r
        for r in logreg_fit_grouped(
            df, "y", "grp", reg=REG, iters=4, tol=0.0
        ).collect()
    }
    assert set(got) == {"0", "1", "2", None}
    ok = True
    for g in got:
        sub = df.where(
            F.col("grp").eqNullSafe(F.lit(g).cast("string"))
        )
        want = logreg_fit(sub, "y", reg=REG, iters=4, tol=0.0)
        r = got[g]
        ok = ok and r["n"] == want["n"] and r["iters_run"] == 4
        ok = ok and np.allclose(r["weights"], want["weights"], atol=1e-6)
        ok = ok and abs(r["intercept"] - want["intercept"]) < 1e-6
        ok = ok and abs(r["loss"] - want["loss"]) < 1e-9
    record_opcheck(
        "logreg_fit_grouped", len(got), bool(ok),
        oracle="cross-implementation",
    )
    assert ok


def test_logreg_grouped_edges(spark):
    from data_export_tool_spark.operators.linear import logreg_fit_grouped

    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0], 1), ("a", [0.0, 1.0], 0),
            ("b", [1.0, 1.0], 1),          # single-class group
            ("c", None, 1), ("c", [], 0),  # no usable vectors
            ("d", [0.5, 0.5], 2),          # non-binary: excluded pre-group
        ],
        "g string, embedding array<double>, y int",
    )
    rows = {r["g"]: r for r in logreg_fit_grouped(df, "y", "g", reg=1.0).collect()}
    assert set(rows) == {"a", "b"}  # c: vectors invalid; d: label invalid
    assert rows["b"]["n"] == 1  # single-class still fits (reg-bounded)
    assert 0 <= 1.0 / (1.0 + np.exp(-(np.dot([1.0, 1.0], rows["b"]["weights"]) + rows["b"]["intercept"]))) <= 1

    import pytest as _pytest

    with _pytest.raises(Exception, match="max_group_rows"):
        logreg_fit_grouped(df, "y", "g", max_group_rows=1).collect()


def test_huber_fit_replay_robustness_and_ridge_limit(spark, emb):
    from data_export_tool_spark.operators.linear import huber_fit

    # exact linear target + 10 gross outliers (corrupt labels)
    df = emb.withColumn(
        "target",
        F.when(
            F.col("vec_id") % 50 == 0,
            F.lit(1e6),  # corrupt
        ).otherwise(
            2.0 * F.col("embedding")[0] - 3.0 * F.col("embedding")[3] + 0.5
        ),
    )
    iters, delta = 8, 1.0
    model = huber_fit(df, "target", delta=delta, reg=REG, iters=iters, tol=0.0)

    # step-for-step numpy replay of the weighted IRLS
    X, _ = _collected(emb, binary=False)
    ids = np.array([r["vec_id"] for r in emb.select("vec_id").collect()])
    y = 2.0 * X[:, 0] - 3.0 * X[:, 3] + 0.5
    y[ids % 50 == 0] = 1e6
    d = X.shape[1]
    Xa = np.hstack([X, np.ones((len(X), 1))])
    pen = np.diag([REG] * d + [0.0])
    w = np.zeros(d + 1)
    loss = None
    for _ in range(iters):
        r = y - Xa @ w
        a = np.abs(r)
        om = np.where(a <= delta, 1.0, delta / np.maximum(a, 1e-300))
        hub = np.where(a <= delta, 0.5 * r * r, delta * (a - 0.5 * delta))
        loss = (hub.sum() + 0.5 * REG * float(w[:d] @ w[:d])) / len(Xa)
        H = (Xa * om[:, None]).T @ Xa
        H = (H + H.T) / 2.0
        w = np.linalg.solve(H + pen, Xa.T @ (om * y))

    ok = (
        model["n"] == len(X)
        and model["iters_run"] == iters
        and np.allclose(model["weights"], w[:d], atol=1e-6)
        and abs(model["intercept"] - w[d]) < 1e-6
        and abs(model["loss"] - loss) < 1e-6 * max(1.0, abs(loss))
    )
    # robustness: huber ignores the corrupt 2%, ridge is dragged away
    true_w = np.zeros(d)
    true_w[0], true_w[3] = 2.0, -3.0
    huber_err = float(np.max(np.abs(np.array(model["weights"]) - true_w)))
    ridge = ridge_fit(df, "target", reg=REG)
    ridge_err = float(np.max(np.abs(np.array(ridge["weights"]) - true_w)))
    # huber's influence per outlier is bounded by delta, so 2% gross
    # corruption leaves a small finite bias (~0.15 here); ridge is
    # dragged five orders of magnitude off (measured ~1.3e5)
    ok = ok and huber_err < 0.3 and ridge_err > 1000 * huber_err
    record_opcheck(
        "huber_fit", len(X), bool(ok), oracle="python-reference",
        value=huber_err,
    )
    assert ok

    # delta -> inf limit: all weights 1, so the fit IS the ridge solve
    clean = emb.withColumn(
        "target",
        2.0 * F.col("embedding")[0] - 3.0 * F.col("embedding")[3] + 0.5,
    )
    hb = huber_fit(clean, "target", delta=1e9, reg=REG, iters=2, tol=0.0)
    rg = ridge_fit(clean, "target", reg=REG)
    assert np.allclose(hb["weights"], rg["weights"], atol=1e-8)
    assert abs(hb["intercept"] - rg["intercept"]) < 1e-8

    with pytest.raises(ValueError):
        huber_fit(clean, "target", delta=0.0)


def test_theil_sen_grouped_matches_python_replay(spark):
    """Exact python replay of the pairwise-median fit, the
    outlier-immunity law vs OLS, and the <2-distinct-x exclusion."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.linear import theil_sen_fit_grouped

    rows = []
    # g1: clean line y = 2x + 3; g2: same line + 3 wild outliers;
    # g3: constant x (excluded); g4: single point (excluded)
    for i in range(40):
        x = i * 0.5
        rows.append(("g1", x, 2 * x + 3))
        rows.append(("g2", x, 2 * x + 3 + (1e6 if i in (5, 17, 29) else 0)))
    rows += [("g3", 1.0, float(i)) for i in range(10)]
    rows.append(("g4", 1.0, 2.0))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in theil_sen_fit_grouped(df, "x", "y", "g").collect()
    }
    assert set(got) == {"g1", "g2"}
    # python replay
    ok = True
    for g in ("g1", "g2"):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
            if x2 != x1
        ]
        slope = float(np.median(slopes))
        intercept = float(np.median([y - slope * x for x, y in pts]))
        assert got[g][1] == pytest.approx(slope, abs=1e-9), g
        assert got[g][2] == pytest.approx(intercept, abs=1e-9), g
    # robustness: 3/40 wild outliers barely move the fit
    assert got["g2"][1] == pytest.approx(2.0, abs=0.1)
    assert got["g2"][2] == pytest.approx(3.0, abs=1.0)
    # ...whereas OLS on g2 is destroyed (sanity contrast)
    g2 = [(x, y) for gg, x, y in rows if gg == "g2"]
    X = np.array([x for x, _ in g2]); Y = np.array([y for _, y in g2])
    ols = float(np.polyfit(X, Y, 1)[0])
    assert abs(ols - 2.0) > 100
    record_opcheck("theil_sen_grouped", 4, ok, oracle="python-reference")

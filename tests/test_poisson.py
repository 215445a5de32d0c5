"""Poisson GLM (operators/linear.py poisson_fit): step-for-step IRLS
replay, planted-rate recovery, prediction contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.linear import (
    poisson_fit,
    poisson_predict,
    py_poisson_irls,
)

REG = 1e-2


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _counts(emb):
    # deterministic planted counts: floor(exp(4·x0 − 3·x3 + 1))
    return emb.withColumn(
        "y",
        F.floor(
            F.exp(
                4.0 * F.col("embedding")[0].cast("double")
                - 3.0 * F.col("embedding")[3].cast("double")
                + 1.0
            )
        ).cast("double"),
    )


def test_poisson_fit_matches_irls_replay(spark, emb):
    df = _counts(emb)
    iters = 8
    model = poisson_fit(df, "y", reg=REG, iters=iters, tol=0.0)

    rows = df.select("embedding", "y").collect()
    X = np.array([r["embedding"] for r in rows], dtype="float64")
    y = np.array([r["y"] for r in rows], dtype="float64")
    w, loss, it = py_poisson_irls(X, y, REG, iters, 0.0)
    d = X.shape[1]
    ok = (
        model["n"] == len(X)
        and model["iters_run"] == iters == it
        and np.allclose(model["weights"], w[:d], atol=1e-6)
        and abs(model["intercept"] - w[d]) < 1e-6
        and abs(model["loss"] - loss) < 1e-9
    )
    # rate recovery: the planted log-linear structure re-emerges.
    # floor() quantization (most small rates truncate to 0) steepens
    # the fitted slopes, so the bound is loose — the exact correctness
    # claim is the replay equality above, not recovery
    ok = ok and abs(model["weights"][0] - 4.0) < 1.2
    ok = ok and abs(model["weights"][3] + 3.0) < 1.2
    # prediction quality: fitted rate correlates strongly with counts
    scored = poisson_predict(df, model).select("y", "rate").collect()
    yy = np.array([r["y"] for r in scored])
    rr = np.array([r["rate"] for r in scored])
    corr = float(np.corrcoef(yy, rr)[0, 1])
    ok = ok and corr > 0.95
    record_opcheck(
        "poisson_fit", len(X), bool(ok), oracle="python-reference",
        value=corr, floor=0.95,
    )
    assert ok, (model["weights"][0], model["weights"][3], corr)


def test_poisson_label_and_null_contract(spark, emb):
    df = _counts(emb)
    # negative labels are excluded; NULL labels are excluded
    df2 = df.withColumn(
        "y",
        F.when(F.col("vec_id") % 5 == 0, F.lit(None)).otherwise(
            F.when(F.col("vec_id") % 7 == 0, F.lit(-3.0)).otherwise(
                F.col("y")
            )
        ),
    )
    kept = df2.where(F.col("y").isNotNull() & (F.col("y") >= 0)).count()
    model = poisson_fit(df2, "y", reg=REG, iters=3, tol=0.0)
    assert model["n"] == kept
    # wrong-dimension vectors score NULL
    bad = spark.createDataFrame(
        [([0.1, 0.2], 1.0)], "embedding array<double>, y double"
    )
    r = poisson_predict(bad, model).select("rate").first()
    assert r["rate"] is None


def test_poisson_validation(spark, emb):
    with pytest.raises(ValueError, match="reg"):
        poisson_fit(_counts(emb), "y", reg=-1.0)
    with pytest.raises(ValueError, match="iters"):
        poisson_fit(_counts(emb), "y", iters=0)
    empty = _counts(emb).where(F.lit(False))
    with pytest.raises(ValueError, match="no usable"):
        poisson_fit(empty, "y")

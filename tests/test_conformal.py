"""Split-conformal intervals (operators/conformal.py): exact
order-statistic replay, the finite-sample coverage guarantee on
exchangeable data, degenerate/NULL contracts, and the projection-only
apply plan."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.conformal import conformal_apply, conformal_fit


def test_qhat_is_exact_kth_order_statistic(spark):
    rng = random.Random(11)
    rows = [(float(i), float(i) + rng.gauss(0, 2.0)) for i in range(400)]
    df = spark.createDataFrame(rows, "pred double, y double")
    for alpha in (0.05, 0.1, 0.25):
        model = conformal_fit(df, "y", "pred", alpha=alpha)
        res = sorted(abs(y - p) for p, y in rows)
        k = math.ceil((len(rows) + 1) * (1 - alpha))
        assert model["k"] == k and model["n_cal"] == len(rows)
        assert model["qhat"] == pytest.approx(res[k - 1], abs=0)
    record_opcheck("conformal_qhat", 3, True, oracle="python-reference")


def test_coverage_guarantee_on_exchangeable_data(spark):
    """Empirical held-out coverage must be >= 1 - alpha (up to
    finite-sample noise) and not wildly over."""
    rng = random.Random(3)
    alpha = 0.1
    cal = [(float(i % 50), float(i % 50) + rng.gauss(0, 1.0)) for i in range(1000)]
    new = [(float(i % 50), float(i % 50) + rng.gauss(0, 1.0)) for i in range(1000)]
    model = conformal_fit(
        spark.createDataFrame(cal, "pred double, y double"), "y", "pred", alpha=alpha
    )
    out = conformal_apply(
        spark.createDataFrame(new, "pred double, y double"), "pred", model
    )
    cov = out.select(
        F.avg(
            ((F.col("y") >= F.col("pi_lo")) & (F.col("y") <= F.col("pi_hi"))).cast(
                "double"
            )
        ).alias("c")
    ).collect()[0]["c"]
    assert cov >= 1 - alpha - 0.03
    assert cov <= 1.0
    record_opcheck(
        "conformal_coverage", 1000, cov >= 1 - alpha - 0.03,
        oracle="python-reference", value=cov,
    )


def test_conformal_degenerate_and_null_contracts(spark):
    df = spark.createDataFrame(
        [(1.0, 1.5), (2.0, None), (None, 3.0)], "pred double, y double"
    )
    # n=1, alpha=0.1 -> k=2 > n -> honest infinite interval
    m = conformal_fit(df, "y", "pred", alpha=0.1)
    assert m["qhat"] == float("inf") and m["n_cal"] == 1
    out = conformal_apply(df, "pred", m).collect()
    assert out[0]["pi_hi"] == float("inf")
    with pytest.raises(ValueError):
        conformal_fit(df.where("y IS NULL"), "y", "pred")
    with pytest.raises(ValueError):
        conformal_fit(df, "y", "pred", alpha=1.0)


def test_apply_is_projection_only(spark):
    df = spark.createDataFrame([(1.0,)], "pred double")
    plan = (
        conformal_apply(df, "pred", {"qhat": 2.0})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_grouped_conformal_matches_per_group_fit(spark):
    """Each group's q̂ must equal the global fit run on that group's
    subset — cross-implementation oracle — and small strata surface
    infinite intervals."""
    from data_export_tool_spark.operators.conformal import (
        conformal_apply_grouped,
        conformal_fit_grouped,
    )

    rng = random.Random(4)
    rows = []
    for g, sd in (("en", 1.0), ("de", 3.0), ("zh", 0.2)):
        for i in range(300):
            rows.append((g, float(i % 20), float(i % 20) + rng.gauss(0, sd)))
    rows += [("tiny", 1.0, 2.0)] * 3  # k=ceil(4*0.9)=4 > 3 -> inf
    df = spark.createDataFrame(rows, "grp string, pred double, y double")
    got = {
        r["grp"]: (r["qhat"], r["n_cal"], r["k"])
        for r in conformal_fit_grouped(df, "y", "pred", "grp", alpha=0.1).collect()
    }
    assert set(got) == {"en", "de", "zh", "tiny"}
    for g in ("en", "de", "zh"):
        single = conformal_fit(df.where(F.col("grp") == g), "y", "pred", alpha=0.1)
        assert got[g] == (single["qhat"], single["n_cal"], single["k"]), g
    assert got["tiny"][0] == float("inf")
    # wider-noise groups get wider intervals: the Mondrian point
    assert got["de"][0] > got["en"][0] > got["zh"][0]
    out = conformal_apply_grouped(
        df, "pred", "grp", conformal_fit_grouped(df, "y", "pred", "grp")
    )
    row = out.where("grp = 'en'").limit(1).collect()[0]
    assert row["pi_hi"] - row["pred"] == pytest.approx(got["en"][0])
    record_opcheck(
        "conformal_fit_grouped", len(got), True, oracle="cross-implementation"
    )

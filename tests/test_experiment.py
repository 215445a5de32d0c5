"""A/B readout (operators/experiment.py) against a full Python replay
of the sufficient statistics + Welch arithmetic, with an engineered
true-effect / no-effect pair and NULL/small-sample edges."""

from __future__ import annotations

import math
import statistics

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.experiment import ab_test, py_welch


def _mk(spark):
    rows = []
    for i in range(4000):
        g = "control" if i % 2 == 0 else "treatment"
        u = ((i * 2654435761) % 10_000) / 10_000.0  # deterministic noise
        shifted = u + (0.08 if g == "treatment" else 0.0)  # true effect
        flat = u  # no effect
        rows.append(
            (g, round(shifted, 9), round(flat, 9), None if i % 10 == 0 else u)
        )
    return rows, spark.createDataFrame(
        rows, "grp string, m_shift double, m_flat double, m_nulls double"
    )


def test_ab_test_matches_python_replay(spark):
    rows, df = _mk(spark)
    got = {
        r["metric"]: r
        for r in ab_test(
            df, "grp", ["m_shift", "m_flat", "m_nulls"], "control", "treatment"
        ).collect()
    }
    ok = True
    for mi, m in enumerate(["m_shift", "m_flat", "m_nulls"]):
        a = [r[1 + mi] for r in rows if r[0] == "control" and r[1 + mi] is not None]
        b = [r[1 + mi] for r in rows if r[0] == "treatment" and r[1 + mi] is not None]
        t, p = py_welch(
            len(a), statistics.fmean(a), statistics.variance(a),
            len(b), statistics.fmean(b), statistics.variance(b),
        )
        r = got[m]
        ok = ok and r["n_a"] == len(a) and r["n_b"] == len(b)
        ok = ok and abs(r["mean_a"] - statistics.fmean(a)) < 1e-9
        ok = ok and abs(r["t_stat"] - t) < 1e-6 and abs(r["p_value"] - p) < 1e-9
    # engineered outcomes
    assert got["m_shift"]["significant"] is True
    assert got["m_flat"]["significant"] is False
    assert abs(got["m_flat"]["t_stat"]) < 2.0
    assert got["m_shift"]["lift"] > 0.1
    record_opcheck(
        "ab_test", len(got), ok, oracle="python-reference",
        value=round(got["m_shift"]["p_value"], 9),
    )
    assert ok


def test_ab_test_edges(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0)], "grp string, m double"
    )
    r = ab_test(df, "grp", "m", "a", "b").collect()[0]
    # n_b < 2: no test, but counts/means still reported
    assert r["n_a"] == 2 and r["n_b"] == 1
    assert r["t_stat"] is None and r["significant"] is None
    assert abs(r["lift"] - 1.0) < 1e-12
    # zero-variance arms: se2 == 0 -> no statistic rather than a crash
    z = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], "grp string, m double"
    )
    rz = ab_test(z, "grp", "m", "a", "b").collect()[0]
    assert rz["t_stat"] is None and rz["p_value"] is None
    with pytest.raises(ValueError):
        ab_test(df, "grp", [], "a", "b")

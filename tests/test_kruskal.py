"""Kruskal-Wallis (operators/experiment.py kruskal_wallis): python
replay, k=2 ≡ Mann-Whitney z² identity, contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.experiment import (
    kruskal_wallis,
    mann_whitney,
    py_kruskal,
)


def test_kruskal_matches_replay(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = kruskal_wallis(li, "l_extendedprice", "l_returnflag").first()
    rows = li.select("l_returnflag", "l_extendedprice").collect()
    groups: dict = {}
    for r in rows:
        if r["l_extendedprice"] is None or r["l_returnflag"] is None:
            continue
        groups.setdefault(r["l_returnflag"], []).append(
            float(r["l_extendedprice"])
        )
    h, hc, dof, p = py_kruskal(groups)
    assert got["k"] == len(groups)
    assert got["n"] == sum(len(v) for v in groups.values())
    assert got["h"] == pytest.approx(h, rel=1e-9)
    assert got["h_corrected"] == pytest.approx(hc, rel=1e-9)
    assert got["dof"] == dof
    assert got["p_value"] == pytest.approx(p, rel=1e-6, abs=1e-12)
    from tests.conftest import record_opcheck

    record_opcheck(
        "kruskal_wallis", got["n"], True, oracle="python-reference",
        value=float(got["p_value"]),
    )


def test_kruskal_two_groups_equals_mw_z_squared(spark):
    # classic identity: for k=2, tie-corrected H equals the
    # (un-continuity-corrected) rank-sum z² — a cross-operator lock
    rows = [("a", float(v)) for v in [1, 3, 5, 7, 9, 11, 2, 2]] + [
        ("b", float(v)) for v in [2, 4, 6, 8, 10, 2, 2]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    kw = kruskal_wallis(df, "v", "g").first()
    mw = mann_whitney(df, "v", "g", "a", "b").first()
    assert kw["h_corrected"] == pytest.approx(mw["z"] ** 2, rel=1e-9)


def test_kruskal_textbook_and_validation(spark):
    # hand-checkable no-tie case: three groups, clear separation
    rows = (
        [("a", float(v)) for v in (1, 2, 3)]
        + [("b", float(v)) for v in (4, 5, 6)]
        + [("c", float(v)) for v in (7, 8, 9)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = kruskal_wallis(df, "v", "g").first()
    # rank means 2, 5, 8; H = 12/(9·10)·3·((2-5)²+(5-5)²+(8-5)²) = 7.2
    assert got["h"] == pytest.approx(7.2)
    assert got["h_corrected"] == pytest.approx(7.2)  # no ties
    one = df.where(F.col("g") == "a")
    with pytest.raises(ValueError, match="groups"):
        kruskal_wallis(one, "v", "g")

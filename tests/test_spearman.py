"""Spearman rank correlation (operators/validate.py spearman_matrix)
+ the avg_rank method behind it: DuckDB rank-arithmetic oracle,
tie convention, monotone-invariance law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.features import rank_transform
from data_export_tool_spark.operators.validate import spearman_matrix


def test_avg_rank_tie_convention(spark):
    # values 10,20,20,30 -> avg ranks 1, 2.5, 2.5, 4 (scipy 'average')
    df = spark.createDataFrame(
        [(10.0,), (20.0,), (20.0,), (30.0,), (None,)], "v double"
    )
    got = sorted(
        (r["v"], r["v_avg_rank"])
        for r in rank_transform(df, "v", method="avg_rank").collect()
        if r["v"] is not None
    )
    assert got == [(10.0, 1.0), (20.0, 2.5), (20.0, 2.5), (30.0, 4.0)]


def test_spearman_monotone_invariance(spark):
    # rho(x, exp(x)) == 1 exactly: Spearman sees only the ordering
    df = spark.range(0, 200).select(
        (F.col("id") * 0.1).alias("x"),
        F.exp(F.col("id") * 0.1).alias("y"),
        (-F.col("id").cast("double")).alias("z"),
    )
    got = {
        (r["col_a"], r["col_b"]): r["rho"]
        for r in spearman_matrix(df, ["x", "y", "z"]).collect()
    }
    assert got[("x", "y")] == pytest.approx(1.0, abs=1e-12)
    assert got[("x", "z")] == pytest.approx(-1.0, abs=1e-12)


def test_spearman_duckdb_oracle(spark, sf_dir):
    import duckdb

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = {
        (r["col_a"], r["col_b"]): (round(r["rho"], 9), r["n"])
        for r in spearman_matrix(li, cols).collect()
    }
    con = duckdb.connect()
    ranked = ", ".join(
        f"RANK() OVER (ORDER BY {c}) + "
        f"(COUNT(*) OVER (PARTITION BY {c}) - 1) / 2.0 AS r_{c}"
        for c in cols
    )
    want = {}
    rel = con.sql(
        f"SELECT {ranked} FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    con.register("ranks", rel)
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            rho, n = con.sql(
                f"SELECT corr(r_{a}, r_{b}), COUNT(*) FROM ranks"
            ).fetchall()[0]
            want[(a, b)] = (round(float(rho), 9), int(n))
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "spearman_matrix", len(want), True, oracle="duckdb",
    )


def test_spearman_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError, match="columns"):
        spearman_matrix(df, ["a"])

"""Metric-change contribution (operators/rootcause.py): DuckDB
conditional-agg oracle on real period splits, hand case, share law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.rootcause import (
    metric_contributions,
)


def test_rootcause_hand_case(spark):
    before = spark.createDataFrame(
        [("us", "web", 100.0), ("eu", "web", 50.0), ("us", "app", 30.0)],
        "region string, channel string, rev double",
    )
    after = spark.createDataFrame(
        [("us", "web", 70.0), ("eu", "web", 50.0), ("eu", "app", 40.0)],
        "region string, channel string, rev double",
    )
    got = {
        (r["dimension"], r["dim_value"]): (
            r["before_value"], r["after_value"], r["delta"],
            pytest.approx(r["share"]), r["rank"],
        )
        for r in metric_contributions(
            before, after, ["region", "channel"], "rev"
        ).collect()
    }
    # total: 180 -> 160 = -20
    assert got[("region", "us")][:3] == (130.0, 70.0, -60.0)
    assert got[("region", "us")][3] == pytest.approx(3.0)  # -60/-20
    assert got[("region", "eu")][:3] == (50.0, 90.0, 40.0)
    assert got[("channel", "web")][:3] == (150.0, 120.0, -30.0)
    assert got[("channel", "app")][:3] == (30.0, 40.0, 10.0)
    # the biggest absolute mover ranks 1 in each dimension
    assert got[("region", "us")][4] == 1
    assert got[("channel", "web")][4] == 1
    # shares sum to 1 within each dimension
    for d in ("region", "channel"):
        s = sum(v[3].expected for k, v in got.items() if k[0] == d)
        assert s == pytest.approx(1.0)


def test_rootcause_null_bucket_and_count_metric(spark):
    before = spark.createDataFrame(
        [(None, 1.0), ("a", 1.0)], "k string, v double"
    )
    after = spark.createDataFrame(
        [(None, 1.0), (None, 1.0), ("a", 1.0)], "k string, v double"
    )
    got = {
        r["dim_value"]: r["delta"]
        for r in metric_contributions(
            before, after, ["k"], value_col=None
        ).collect()
    }
    assert got == {"<null>": 1.0, "a": 0.0}


def test_rootcause_duckdb_oracle(spark, sf_dir):
    import duckdb

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cut = "1995-01-01"
    before = li.where(F.col("l_shipdate") < cut)
    after = li.where(F.col("l_shipdate") >= cut)
    got = {
        (r["dimension"], r["dim_value"]): (
            round(r["before_value"], 6), round(r["after_value"], 6),
            round(r["delta"], 6),
            round(r["share"], 9) if r["share"] is not None else None,
        )
        for r in metric_contributions(
            before, after, ["l_returnflag", "l_linestatus"],
            "l_extendedprice",
        ).collect()
    }
    con = duckdb.connect()
    want = {}
    for dim in ("l_returnflag", "l_linestatus"):
        rows = con.sql(
            f"""
            WITH per AS (
              SELECT COALESCE(CAST({dim} AS VARCHAR), '<null>') AS v,
                SUM(CASE WHEN l_shipdate < DATE '{cut}'
                    THEN l_extendedprice ELSE 0 END) AS b,
                SUM(CASE WHEN l_shipdate >= DATE '{cut}'
                    THEN l_extendedprice ELSE 0 END) AS a
              FROM read_parquet('{sf_dir}/lineitem.parquet')
              GROUP BY 1
            )
            SELECT v, b, a, a - b,
                   (a - b) / NULLIF(SUM(a - b) OVER (), 0)
            FROM per
            """
        ).fetchall()
        for v, b, a, d, s in rows:
            want[(dim, v)] = (
                round(float(b), 6), round(float(a), 6),
                round(float(d), 6),
                round(float(s), 9) if s is not None else None,
            )
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck(
        "metric_contributions", len(want), True, oracle="duckdb",
    )


def test_rootcause_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="dims"):
        metric_contributions(df, df, [])
    with pytest.raises(ValueError, match="top_k"):
        metric_contributions(df, df, ["k"], top_k=0)

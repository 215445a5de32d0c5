"""melt / pivot_wide (operators/pivot.py): DuckDB UNION-ALL and
conditional-agg oracles, round-trip law, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.pivot import melt, pivot_wide


def test_melt_hand_case(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, None)], "id long, a double, b double"
    )
    got = sorted(
        (r["id"], r["variable"], r["value"])
        for r in melt(df, ["id"], ["a", "b"]).collect()
    )
    assert got == [
        (1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", None),
    ]
    got2 = sorted(
        (r["id"], r["variable"], r["value"])
        for r in melt(df, ["id"], ["a", "b"], drop_nulls=True).collect()
    )
    assert got2 == [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)]
    with pytest.raises(ValueError, match="value_cols"):
        melt(df, ["id"], [])
    with pytest.raises(ValueError, match="both"):
        melt(df, ["id", "a"], ["a"])


def test_melt_duckdb_oracle(spark, sf_dir):
    import duckdb

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["variable"],
         round(r["value"], 6))
        for r in melt(
            li, ["l_orderkey", "l_linenumber"], cols
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (int(o), int(ln), v, round(float(x), 6))
        for o, ln, v, x in con.sql(
            f"""
            SELECT l_orderkey, l_linenumber, k, v FROM (
              SELECT l_orderkey, l_linenumber,
                     'l_quantity' AS k, l_quantity::DOUBLE AS v
              FROM read_parquet('{sf_dir}/lineitem.parquet')
              UNION ALL
              SELECT l_orderkey, l_linenumber,
                     'l_extendedprice', l_extendedprice
              FROM read_parquet('{sf_dir}/lineitem.parquet')
              UNION ALL
              SELECT l_orderkey, l_linenumber,
                     'l_discount', l_discount
              FROM read_parquet('{sf_dir}/lineitem.parquet')
            )
            """
        ).fetchall()
    )
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck("melt", len(want), True, oracle="duckdb")


def test_pivot_wide_duckdb_oracle(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wide = pivot_wide(ev, ["user_id"], "event_type", "value", agg="sum")
    rows = wide.collect()
    types = sorted(c for c in wide.columns if c != "user_id")
    got = {
        r["user_id"]: tuple(
            round(r[t], 6) if r[t] is not None else None for t in types
        )
        for r in rows
    }
    con = duckdb.connect()
    cases = ", ".join(
        f"SUM(CASE WHEN event_type = '{t}' THEN value END) AS v{i}"
        for i, t in enumerate(types)
    )
    want = {
        int(u): tuple(
            round(float(v), 6) if v is not None else None for v in vs
        )
        for u, *vs in con.sql(
            f"SELECT user_id, {cases} FROM "
            f"read_parquet('{sf_dir}/events.parquet') "
            "WHERE event_type IS NOT NULL GROUP BY user_id"
        ).fetchall()
    }
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck("pivot_wide", len(want), True, oracle="duckdb")


def test_melt_pivot_round_trip(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, 40.0)], "id long, a double, b double"
    )
    long = melt(df, ["id"], ["a", "b"])
    back = pivot_wide(long, ["id"], "variable", "value", agg="sum")
    got = sorted((r["id"], r["a"], r["b"]) for r in back.collect())
    assert got == [(1, 10.0, 20.0), (2, 30.0, 40.0)]


def test_pivot_wide_guards(spark):
    df = spark.createDataFrame(
        [(i, str(i), 1.0) for i in range(30)], "id long, k string, v double"
    )
    with pytest.raises(ValueError, match="distinct"):
        pivot_wide(df, ["id"], "k", "v", max_columns=10)
    with pytest.raises(ValueError, match="agg"):
        pivot_wide(df, ["id"], "k", "v", agg="median")
    with pytest.raises(ValueError, match="group_by"):
        pivot_wide(df, [], "k", "v")

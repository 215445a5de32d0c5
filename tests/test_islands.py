"""Gaps-and-islands (operators/islands.py): DuckDB dense-rank oracle
on real event days, hand-solvable runs, duplicate-grain semantics."""

from __future__ import annotations

import pytest

from data_export_tool_spark.operators.islands import (
    gaps,
    islands,
    longest_streak,
)


def test_islands_hand_case(spark):
    # user a: days 1,2,3 | 5 | 7,8 (dup 8)  user b: 10 only
    rows = [
        ("a", 1), ("a", 2), ("a", 3), ("a", 5), ("a", 7), ("a", 8),
        ("a", 8), ("b", 10),
    ]
    df = spark.createDataFrame(rows, "k string, d int")
    got = {
        (r["k"], r["island_start"]): (
            r["island_end"], r["island_length"], r["n_rows"]
        )
        for r in islands(df, ["k"], "d").collect()
    }
    assert got == {
        ("a", 1): (3, 3, 3),
        ("a", 5): (5, 1, 1),
        ("a", 7): (8, 2, 3),  # duplicate day 8 stays in one island
        ("b", 10): (10, 1, 1),
    }
    g = {
        (r["k"], r["gap_start"]): (r["gap_end"], r["gap_length"])
        for r in gaps(df, ["k"], "d").collect()
    }
    assert g == {("a", 4): (4, 1), ("a", 6): (6, 1)}
    ls = {r["k"]: (r["island_start"], r["island_length"])
          for r in longest_streak(df, ["k"], "d").collect()}
    assert ls == {"a": (1, 3), "b": (10, 1)}


def test_islands_step_and_dates(spark):
    rows = [("k", "2024-01-01"), ("k", "2024-01-02"), ("k", "2024-01-04")]
    df = spark.createDataFrame(rows, "k string, d string").selectExpr(
        "k", "cast(d as date) d"
    )
    got = sorted(
        (str(r["island_start"]), str(r["island_end"]), r["island_length"])
        for r in islands(df, ["k"], "d").collect()
    )
    assert got == [
        ("2024-01-01", "2024-01-02", 2),
        ("2024-01-04", "2024-01-04", 1),
    ]
    # step=2: 10,12,14 is one run; 15 breaks it
    df2 = spark.createDataFrame(
        [("k", 10), ("k", 12), ("k", 14), ("k", 15)], "k string, d int"
    )
    got2 = sorted(
        (r["island_start"], r["island_end"])
        for r in islands(df2, ["k"], "d", step=2).collect()
    )
    assert got2 == [(10, 14), (15, 15)]


def test_islands_validation(spark):
    df = spark.createDataFrame([("a", 1)], "k string, d int")
    with pytest.raises(ValueError, match="step"):
        islands(df, ["k"], "d", step=0)
    with pytest.raises(ValueError, match="key_cols"):
        islands(df, [], "d")


def test_islands_duckdb_oracle(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "cast(ts as date) AS d"
    )
    got = {
        (r["user_id"], str(r["island_start"])): (
            str(r["island_end"]), r["island_length"], r["n_rows"]
        )
        for r in islands(ev, ["user_id"], "d").collect()
    }
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH days AS (
          SELECT user_id, CAST(ts AS DATE) AS d,
                 CAST(ts AS DATE) - DATE '1970-01-01' AS g
          FROM read_parquet('{sf_dir}/events.parquet')
        ), marked AS (
          SELECT *, g - DENSE_RANK() OVER (
                      PARTITION BY user_id ORDER BY g) AS island
          FROM days
        )
        SELECT user_id, MIN(d), MAX(d), COUNT(DISTINCT d), COUNT(*)
        FROM marked GROUP BY user_id, island
        """
    ).fetchall()
    want = {
        (int(u), str(s)): (str(e), int(n), int(c))
        for u, s, e, n, c in rows
    }
    assert got == want

    gg = {
        (r["user_id"], r["gap_start"]): (r["gap_end"], r["gap_length"])
        for r in gaps(ev, ["user_id"], "d").collect()
    }
    grows = con.sql(
        f"""
        WITH days AS (
          SELECT user_id, CAST(ts AS DATE) - DATE '1970-01-01' AS g
          FROM read_parquet('{sf_dir}/events.parquet')
        ), marked AS (
          SELECT *, g - DENSE_RANK() OVER (
                      PARTITION BY user_id ORDER BY g) AS island
          FROM days
        ), isl AS (
          SELECT user_id, MIN(g) AS s, MAX(g) AS e
          FROM marked GROUP BY user_id, island
        ), nx AS (
          SELECT user_id, e, LEAD(s) OVER (
                   PARTITION BY user_id ORDER BY s) AS n
          FROM isl
        )
        SELECT user_id, e + 1, n - 1, n - e - 1 FROM nx
        WHERE n IS NOT NULL
        """
    ).fetchall()
    gwant = {(int(u), int(s)): (int(e), int(n)) for u, s, e, n in grows}
    assert gg == gwant
    from tests.conftest import record_opcheck

    record_opcheck("islands", len(want), True, oracle="duckdb")
    record_opcheck("gaps", len(gwant), True, oracle="duckdb")

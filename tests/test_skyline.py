"""Skyline / Pareto frontier (operators/skyline.py): DuckDB NOT-EXISTS
strict-dominance oracle, hand case, mixed directions, guard."""

from __future__ import annotations

import random

import pytest

from data_export_tool_spark.operators.skyline import py_skyline, skyline


def test_skyline_hand_case(spark):
    # minimize (price, dist): (1,9) (3,3) (9,1) frontier; (4,4) dominated
    # by (3,3); (3,3) duplicated -> both survive (ties dominate nothing)
    rows = [(1, 9), (3, 3), (3, 3), (9, 1), (4, 4), (10, 10)]
    df = spark.createDataFrame(rows, "price int, dist int")
    got = sorted((r["price"], r["dist"])
                 for r in skyline(df, ["price", "dist"]).collect())
    assert got == [(1, 9), (3, 3), (3, 3), (9, 1)]


def test_skyline_mixed_directions_and_nulls(spark):
    # maximize quality, minimize cost; NULL rows excluded
    rows = [(0.9, 5.0), (0.8, 2.0), (0.7, 1.0), (0.6, 3.0), (None, 0.0)]
    df = spark.createDataFrame(rows, "q double, c double")
    got = sorted(
        (r["q"], r["c"])
        for r in skyline(df, ["q", "c"], ["max", "min"]).collect()
    )
    assert got == [(0.7, 1.0), (0.8, 2.0), (0.9, 5.0)]


def test_skyline_random_vs_python_and_duckdb(spark):
    import duckdb

    rng = random.Random(29)
    rows = [
        (i, rng.randint(0, 60), rng.randint(0, 60), rng.random())
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "id long, a int, b int, w double")
    got = sorted(
        (r["id"], r["a"], r["b"])
        for r in skyline(df, ["a", "b"], ["min", "max"]).collect()
    )
    # py_skyline operates on plain value tuples; apply it on (a, -b)
    want = py_skyline(
        [(a, -b) for _, a, b, _ in rows], ["min", "min"]
    )
    got_vals = {(a, -b) for _, a, b in got}
    assert got_vals == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, a INT, b INT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)", [(i, a, b) for i, a, b, _ in rows]
    )
    drows = con.sql(
        """
        SELECT id, a, b FROM t x WHERE NOT EXISTS (
          SELECT 1 FROM t y
          WHERE y.a <= x.a AND y.b >= x.b
            AND (y.a < x.a OR y.b > x.b)
        ) ORDER BY id
        """
    ).fetchall()
    dwant = sorted((int(i), int(a), int(b)) for i, a, b in drows)
    assert got == dwant
    from tests.conftest import record_opcheck

    record_opcheck("skyline", len(dwant), True, oracle="duckdb")


def test_skyline_guard_and_validation(spark):
    df = spark.createDataFrame(
        [(i, -i) for i in range(100)], "a int, b int"
    )
    # (i, -i) is fully anti-correlated: every row is on the frontier,
    # so a guard below 100 must trip in the merge stage
    with pytest.raises(Exception, match="max_candidates"):
        skyline(df, ["a", "b"], max_candidates=50).collect()
    with pytest.raises(ValueError, match="cols"):
        skyline(df, [])
    with pytest.raises(ValueError, match="directions"):
        skyline(df, ["a", "b"], ["min"])
    with pytest.raises(ValueError, match="min"):
        skyline(df, ["a"], ["up"])


def test_sweep_blocked_vs_bruteforce():
    """The block-vectorized _sweep (r10 rewrite) must match brute-force
    dominance exactly ACROSS block boundaries: n > one 2048-row block,
    duplicated frontier points, and a dense low-cardinality grid so
    cross-block dominators and exact ties both occur."""
    import numpy as np

    from data_export_tool_spark.operators.skyline import _sweep

    rng = np.random.default_rng(41)
    n = 5000
    vals = np.column_stack(
        [
            rng.integers(0, 25, n).astype(np.float64),
            rng.integers(0, 25, n).astype(np.float64),
            rng.integers(0, 8, n).astype(np.float64),
        ]
    )
    order = np.lexsort((vals[:, 2], vals[:, 1], vals[:, 0]))
    svals = vals[order]
    keep = _sweep(svals)
    got = {tuple(svals[i]) for i in keep}
    # brute force over the distinct value set
    uniq = np.unique(svals, axis=0)
    dominated = (
        (uniq[:, None, :] <= uniq[None, :, :]).all(axis=2)
        & (uniq[:, None, :] < uniq[None, :, :]).any(axis=2)
    ).any(axis=0)
    want = {tuple(u) for u in uniq[~dominated]}
    assert got == want
    # every surviving duplicate must be kept (ties dominate nothing)
    kept_rows = svals[keep]
    for u in uniq[~dominated]:
        assert (kept_rows == u).all(axis=1).sum() == (
            (svals == u).all(axis=1).sum()
        )
    # ascending index order (callers slice pdf.iloc[order[keep]])
    assert (np.diff(keep) > 0).all()

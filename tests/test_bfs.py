"""Multi-source BFS (operators/graph.py bfs_distances): DuckDB
depth-bounded recursive-CTE oracle, hand graph, directed form."""

from __future__ import annotations

import random

import pytest

from data_export_tool_spark.operators.graph import bfs_distances


def _random_edges(seed=83, n=300, p=0.012):
    rng = random.Random(seed)
    return [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]


def _duck_bfs(edges, sources, max_hops, directed=False):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE e (n BIGINT, m BIGINT)")
    rows = list(edges) + ([] if directed else [(b, a) for a, b in edges])
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    con.execute("CREATE TABLE s (n BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", [(x,) for x in sources])
    got = con.sql(
        f"""
        WITH RECURSIVE walk(n, d) AS (
          SELECT n, 0 FROM s
          UNION
          SELECT e.m, w.d + 1 FROM walk w JOIN e ON e.n = w.n
          WHERE w.d < {max_hops}
        )
        SELECT n, MIN(d) FROM walk GROUP BY n
        """
    ).fetchall()
    return {int(n): int(d) for n, d in got}


def test_bfs_hand_graph(spark):
    # path 1-2-3-4-5 plus isolated pair 8-9
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(df, [1], max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    # hop bound truncates
    got2 = {r["node"]: r["dist"]
            for r in bfs_distances(df, [1], max_hops=2).collect()}
    assert got2 == {1: 0, 2: 1, 3: 2}
    # multi-source: nearest seed wins
    got3 = {r["node"]: r["dist"]
            for r in bfs_distances(df, [1, 5], max_hops=10).collect()}
    assert got3 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_directed(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(df, [2], max_hops=5,
                                  directed=True).collect()}
    assert got == {2: 0, 3: 1, 1: 2, 4: 2}
    want = _duck_bfs(edges, [2], 5, directed=True)
    assert got == want


def test_bfs_duckdb_oracle(spark):
    edges = _random_edges()
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    sources = [0, 7, 211]
    got = {r["node"]: r["dist"]
           for r in bfs_distances(df, sources, max_hops=6).collect()}
    want = _duck_bfs(edges, sources, 6)
    assert got == want
    assert len(want) > 50  # non-vacuous: the BFS actually spread
    from tests.conftest import record_opcheck

    record_opcheck(
        "bfs_distances", len(want), True, oracle="duckdb",
        value=float(len(want)),
    )


def test_bfs_sources_dataframe_and_validation(spark):
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    seeds = spark.createDataFrame([(3,)], "node long")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(df, seeds, max_hops=4).collect()}
    assert got == {3: 0, 2: 1, 1: 2}
    with pytest.raises(ValueError, match="sources"):
        bfs_distances(df, [])
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(df, [1], max_hops=-1)

"""Weighted shortest paths (operators/graph.py sssp): python Dijkstra
oracle on a seeded weighted graph, hand cases, contracts."""

from __future__ import annotations

import heapq
import random

import pytest

from data_export_tool_spark.operators.graph import sssp


def _dijkstra(edges, sources, directed=False):
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        if not directed:
            adj.setdefault(b, []).append((a, w))
    dist = {s: 0.0 for s in sources}
    pq = [(0.0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        d, n = heapq.heappop(pq)
        if d > dist.get(n, float("inf")):
            continue
        for m, w in adj.get(n, []):
            nd = d + w
            if nd < dist.get(m, float("inf")):
                dist[m] = nd
                heapq.heappush(pq, (nd, m))
    return dist


def _random_graph(seed=59, n=250, p=0.02):
    rng = random.Random(seed)
    return [
        (a, b, round(rng.uniform(0.5, 10.0), 3))
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]


def test_sssp_hand_case(spark):
    # 1 -2- 2 -2- 3 and a direct expensive 1-3 edge: path through 2 wins
    edges = [(1, 2, 2.0), (2, 3, 2.0), (1, 3, 5.0)]
    df = spark.createDataFrame(edges, "id_a long, id_b long, w double")
    got = {r["node"]: r["dist"]
           for r in sssp(df, [1], "w").collect()}
    assert got == {1: 0.0, 2: 2.0, 3: 4.0}
    # directed: 3 cannot reach back
    gotd = {r["node"]: r["dist"]
            for r in sssp(df, [3], "w", directed=True).collect()}
    assert gotd == {3: 0.0}
    # parallel edges keep the cheapest
    dup = spark.createDataFrame(
        [(1, 2, 9.0), (1, 2, 1.0)], "id_a long, id_b long, w double"
    )
    assert {r["node"]: r["dist"] for r in sssp(dup, [1], "w").collect()} \
        == {1: 0.0, 2: 1.0}


def test_sssp_dijkstra_oracle(spark):
    edges = _random_graph()
    df = spark.createDataFrame(edges, "id_a long, id_b long, w double")
    sources = [0, 11]
    got = {r["node"]: r["dist"] for r in sssp(df, sources, "w").collect()}
    want = _dijkstra(edges, sources)
    assert set(got) == set(want)
    for k, d in want.items():
        assert got[k] == pytest.approx(d, abs=1e-9)
    assert len(want) > 100  # non-vacuous spread
    from tests.conftest import record_opcheck

    record_opcheck(
        "sssp", len(want), True, oracle="python-reference",
        value=float(len(want)),
    )


def test_sssp_contracts(spark):
    df = spark.createDataFrame(
        [(1, 2, -1.0)], "id_a long, id_b long, w double"
    )
    with pytest.raises(ValueError, match="non-negative"):
        sssp(df, [1], "w")
    ok = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(8)], "id_a long, id_b long, w double"
    )
    with pytest.raises(ValueError, match="max_iter"):
        sssp(ok, [0], "w", max_iter=3)
    with pytest.raises(ValueError, match="sources"):
        sssp(ok, [], "w")

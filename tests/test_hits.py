"""HITS (operators/graph.py hits): numpy power-iteration replay with
identical L1 normalization, hand star graph, contracts."""

from __future__ import annotations

import random

import numpy as np
import pytest

from data_export_tool_spark.operators.graph import hits


def _replay(edges, n_iter):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, t in set(edges):
        A[idx[s], idx[t]] = 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    a = None
    for _ in range(n_iter):
        a = A.T @ h
        a = a / (a.sum() or 1.0)
        h = A @ a
        h = h / (h.sum() or 1.0)
    return {n: (h[idx[n]], a[idx[n]]) for n in nodes}


def test_hits_star_graph(spark):
    # hub 1 points at 2,3,4: 1 is the pure hub, 2-4 pure authorities
    edges = [(1, 2), (1, 3), (1, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, n_iter=5).collect()}
    assert got[1][0] == pytest.approx(1.0)
    assert got[1][1] == pytest.approx(0.0)
    for n in (2, 3, 4):
        assert got[n][0] == pytest.approx(0.0)
        assert got[n][1] == pytest.approx(1 / 3)


def test_hits_replay_oracle(spark):
    rng = random.Random(101)
    edges = [
        (a, b)
        for a in range(80)
        for b in range(80)
        if a != b and rng.random() < 0.05
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, n_iter=15).collect()}
    want = _replay(edges, 15)
    assert set(got) == set(want)
    for n, (h, a) in want.items():
        assert got[n][0] == pytest.approx(h, abs=1e-9)
        assert got[n][1] == pytest.approx(a, abs=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "hits", len(want), True, oracle="python-reference",
    )


def test_hits_contracts(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(df, n_iter=0)
    empty = df.where("id_a < 0")
    assert hits(empty, n_iter=2).count() == 0


def test_hits_empty_graph_string_ids(spark):
    from data_export_tool_spark.operators.graph import hits

    empty = spark.createDataFrame([], "id_a string, id_b string")
    out = hits(empty)
    assert out.count() == 0
    # empty-path schema must track the node-id type, not hardcode long
    assert out.schema["node"].dataType.simpleString() == "string"

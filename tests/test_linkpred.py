"""Link prediction (operators/linkpred.py): exact python replay,
hand-solvable graph, hub-cap semantics."""

from __future__ import annotations

import math
import random

import pytest

from data_export_tool_spark.operators.linkpred import (
    link_prediction,
    py_link_scores,
)


def _random_graph(seed=71, n=120, p=0.06):
    rng = random.Random(seed)
    edges = []
    for u in range(n):
        for w in range(u + 1, n):
            if rng.random() < p:
                edges.append((u, w))
    return edges


def _collect(df):
    return {
        (r["u"], r["w"]): (
            r["cn"],
            r["jaccard"],
            r["aa"],
            r["ra"],
            r["pa"],
        )
        for r in df.collect()
    }


def test_link_prediction_matches_python_replay(spark):
    edges = _random_graph()
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _collect(link_prediction(df))
    want = py_link_scores(edges)
    assert set(got) == set(want)
    for k, (cn, jac, aa, ra, pa) in want.items():
        g = got[k]
        assert g[0] == cn
        assert g[1] == pytest.approx(jac, rel=1e-9)
        assert g[2] == pytest.approx(aa, rel=1e-9)
        assert g[3] == pytest.approx(ra, rel=1e-9)
        assert g[4] == pa
    from tests.conftest import record_opcheck

    record_opcheck(
        "link_prediction", len(want), True, oracle="python-reference",
        value=float(len(want)),
    )


def test_link_prediction_hand_graph(spark):
    # path a-b-c plus hub h connected to a and c:
    # non-edge (a, c): common neighbors {b, h}
    edges = [("a", "b"), ("b", "c"), ("h", "a"), ("h", "c"), ("h", "d")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = _collect(link_prediction(df))
    # deg: a=2 (b,h), b=2 (a,c), c=2 (b,h), d=1, h=3
    cn, jac, aa, ra, pa = got[("a", "c")]
    assert cn == 2
    assert jac == pytest.approx(2 / (2 + 2 - 2))
    assert aa == pytest.approx(1 / math.log(2) + 1 / math.log(3))
    assert ra == pytest.approx(1 / 2 + 1 / 3)
    assert pa == 4
    # existing edges never scored
    assert ("a", "b") not in got and ("h", "a") not in got
    # (a, d) share only h -> cn=1
    assert got[("a", "d")][0] == 1
    assert got[("c", "d")][0] == 1


def test_link_prediction_hub_cap_drops_center_not_degree(spark):
    edges = [("a", "b"), ("b", "c"), ("h", "a"), ("h", "c"), ("h", "d")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = _collect(link_prediction(df, max_center_degree=2))
    want = py_link_scores(edges, max_center_degree=2)
    assert got == {
        k: (c, pytest.approx(j), pytest.approx(a), pytest.approx(r), p)
        for k, (c, j, a, r, p) in want.items()
    }
    # h (deg 3) no longer testifies: (a,c) keeps only b as witness,
    # but jaccard/pa still use FULL degrees
    cn, jac, aa, ra, pa = got[("a", "c")]
    assert cn == 1
    assert jac == pytest.approx(1 / 3)  # 1/(2+2-1) with full degrees
    assert pa == 4
    assert ("a", "d") not in got  # its only witness was the hub


def test_link_prediction_top_k(spark):
    edges = _random_graph(seed=73, n=60, p=0.1)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = link_prediction(df, top_k=3).collect()
    per_u = {}
    for r in got:
        per_u.setdefault(r["u"], []).append((r["rank"], r["aa"], r["w"]))
    full = py_link_scores(edges)
    for u, rows in per_u.items():
        assert len(rows) <= 3
        # ranks ordered by (aa desc, w asc), matching the replay's best
        rows.sort()
        cands = sorted(
            [
                (-v[2], w if w != u else uu)
                for (uu, w), v in full.items()
                if u in (uu, w)
            ]
        )
        best_aa = -cands[0][0]
        assert rows[0][1] == pytest.approx(best_aa, rel=1e-9)
    with pytest.raises(ValueError, match="top_k"):
        link_prediction(df, top_k=0)
    with pytest.raises(ValueError, match="min_common"):
        link_prediction(df, min_common=0)

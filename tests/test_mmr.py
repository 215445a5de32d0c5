"""MMR re-ranking (operators/ranking.py mmr_rerank): exact greedy
replay, λ endpoint laws, guard."""

from __future__ import annotations

import random

import numpy as np
import pytest

from data_export_tool_spark.operators.ranking import mmr_rerank, py_mmr


def _cands(seed=7, n_q=4, n=40, d=8):
    rng = random.Random(seed)
    rows = []
    for q in range(n_q):
        for i in range(n):
            v = [rng.gauss(0, 1) for _ in range(d)]
            rows.append((q, i, round(rng.random(), 6), v))
    return rows


def test_mmr_matches_replay(spark):
    rows = _cands()
    df = spark.createDataFrame(
        rows, "q long, doc long, rel double, vec array<double>"
    )
    got = {}
    for r in mmr_rerank(df, "q", "doc", "rel", "vec", k=8,
                        lam=0.6).collect():
        got.setdefault(r["q"], []).append(
            (r["mmr_rank"], r["doc"], round(r["mmr_score"], 9))
        )
    for q in got:
        got[q].sort()
    want = {}
    for q in {r[0] for r in rows}:
        sub = sorted(
            [r for r in rows if r[0] == q], key=lambda r: r[1]
        )
        vecs = np.array([r[3] for r in sub], dtype=float)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vecs = vecs / norms[:, None]
        cands = [(r[1], r[2], vecs[i]) for i, r in enumerate(sub)]
        picked = py_mmr(cands, 8, 0.6)
        want[q] = [
            (i + 1, doc, round(s, 9))
            for i, (doc, s) in enumerate(picked)
        ]
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck(
        "mmr_rerank",
        sum(len(v) for v in want.values()),
        True,
        oracle="python-reference",
    )


def test_mmr_lambda_endpoints(spark):
    rows = _cands(seed=11, n_q=1, n=25)
    df = spark.createDataFrame(
        rows, "q long, doc long, rel double, vec array<double>"
    )
    # λ=1: pure relevance — selection order is score desc
    pure = [
        (r["mmr_rank"], r["doc"])
        for r in mmr_rerank(df, "q", "doc", "rel", "vec", k=5,
                            lam=1.0).collect()
    ]
    by_rel = [
        r[1] for r in sorted(rows, key=lambda r: (-r[2], r[1]))[:5]
    ]
    assert [d for _, d in sorted(pure)] == by_rel
    # λ=0.5 with duplicated vectors: the duplicate of the top pick is
    # pushed behind a diverse doc
    dup = [(0, 100, 0.99, rows[0][3]), (0, 101, 0.98, rows[0][3])]
    diverse = [(0, 102, 0.5, [-x for x in rows[0][3]])]
    df2 = spark.createDataFrame(
        dup + diverse, "q long, doc long, rel double, vec array<double>"
    )
    order = [
        r["doc"]
        for r in sorted(
            mmr_rerank(df2, "q", "doc", "rel", "vec", k=3,
                       lam=0.5).collect(),
            key=lambda r: r["mmr_rank"],
        )
    ]
    assert order == [100, 102, 101]


def test_mmr_guards(spark):
    rows = _cands(n_q=1, n=30)
    df = spark.createDataFrame(
        rows, "q long, doc long, rel double, vec array<double>"
    )
    with pytest.raises(Exception, match="max_candidates"):
        mmr_rerank(df, "q", "doc", "rel", "vec", k=3,
                   max_candidates=10).collect()
    with pytest.raises(ValueError, match="k"):
        mmr_rerank(df, "q", "doc", "rel", "vec", k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, "q", "doc", "rel", "vec", lam=1.5)

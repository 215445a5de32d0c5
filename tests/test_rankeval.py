"""Ranking metrics (operators/rankeval.py): exact python replay of
NDCG@k/MRR/MAP@k/hits/recall over designed ranking shapes + DuckDB
window replay of the NDCG formula, zero-row conventions, and the
graded/exp-gain variants."""

from __future__ import annotations

import math

import pytest

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.rankeval import (
    ranking_metrics,
    ranking_metrics_summary,
)

# (query, item, rank) predictions and (query, item, rel) truth:
# q1 perfect, q2 inverted, q3 nothing relevant retrieved, q4 judged but
# never retrieved, q5 graded relevance with an unjudged intruder
PREDS = [
    (1, 101, 1), (1, 102, 2), (1, 103, 3),
    (2, 203, 1), (2, 202, 2), (2, 201, 3),
    (3, 301, 1), (3, 302, 2),
    (5, 501, 1), (5, 999, 2), (5, 502, 3), (5, 503, 4),
]
TRUTH = [
    (1, 101, 1.0), (1, 102, 1.0), (1, 109, 1.0),
    (2, 201, 1.0), (2, 202, 1.0),
    (3, 399, 1.0),
    (4, 401, 1.0),
    (5, 501, 3.0), (5, 502, 2.0), (5, 503, 1.0), (5, 504, 2.0),
    (2, 203, 0.0),  # explicitly judged irrelevant
]
K = 3


def _python_replay(exp_gain=False):
    import collections

    preds = collections.defaultdict(list)
    for q, i, r in PREDS:
        if r <= K:
            preds[q].append((r, i))
    rel = collections.defaultdict(dict)
    for q, i, g in TRUTH:
        rel[q][i] = g
    out = {}
    for q in sorted(set(rel) | set(preds)):
        ranked = [i for _, i in sorted(preds.get(q, []))]
        gains = [rel[q].get(i, 0.0) for i in ranked]

        def g(x):
            return (2**x - 1) if exp_gain else x

        dcg = sum(g(x) / math.log2(r + 2) for r, x in enumerate(gains))
        judged_pos = sorted(
            [v for v in rel[q].values() if v > 0], reverse=True
        )[:K]
        idcg = sum(g(x) / math.log2(r + 2) for r, x in enumerate(judged_pos))
        hits = [1.0 if x > 0 else 0.0 for x in gains]
        n_rel = len([v for v in rel[q].values() if v > 0])
        rr = 0.0
        for r, h in enumerate(hits):
            if h:
                rr = 1.0 / (r + 1)
                break
        ap = 0.0
        ch = 0
        for r, h in enumerate(hits):
            if h:
                ch += 1
                ap += ch / (r + 1)
        out[q] = dict(
            ndcg=(dcg / idcg) if idcg > 0 else 0.0,
            mrr=rr,
            map=(ap / min(n_rel, K)) if n_rel else 0.0,
            hits=int(sum(hits)),
            recall=(sum(hits) / n_rel) if n_rel else 0.0,
            n_rel=n_rel,
        )
    return out


@pytest.fixture(scope="module")
def frames(spark):
    p = spark.createDataFrame(PREDS, "query_id long, item_id long, rank int")
    t = spark.createDataFrame(TRUTH, "query_id long, item_id long, rel double")
    return p, t


def test_ranking_metrics_match_python_replay(spark, frames):
    p, t = frames
    got = {r["query_id"]: r.asDict() for r in ranking_metrics(p, t, k=K).collect()}
    want = _python_replay()
    assert set(got) == set(want)  # q4 (never retrieved) included
    n = 0
    for q, w in want.items():
        g = got[q]
        assert g["ndcg_at_k"] == pytest.approx(w["ndcg"], abs=1e-6), q
        assert g["mrr"] == pytest.approx(w["mrr"], abs=1e-6), q
        assert g["map_at_k"] == pytest.approx(w["map"], abs=1e-6), q
        assert g["hits_at_k"] == w["hits"], q
        assert g["recall_at_k"] == pytest.approx(w["recall"], abs=1e-6), q
        assert g["n_relevant"] == w["n_rel"], q
        n += 5
    # q4: judged, nothing retrieved -> all-zero metric row
    assert got[4]["n_retrieved"] == 0 and got[4]["ndcg_at_k"] == 0.0
    record_opcheck("ranking_metrics", n, True, oracle="python-reference")


def test_ranking_metrics_duckdb_ndcg(spark, frames):
    """Independent DuckDB replay of the NDCG@k column."""
    import duckdb

    p, t = frames
    con = duckdb.connect()
    con.execute("CREATE TABLE p(q BIGINT, i BIGINT, rk INT)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", PREDS)
    con.execute("CREATE TABLE t(q BIGINT, i BIGINT, rel DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", TRUTH)
    want = {
        int(q): round(float(v), 6)
        for q, v in con.sql(f"""
        WITH dcg AS (
          SELECT p.q, SUM(COALESCE(t.rel, 0) / log2(p.rk + 1)) AS dcg
          FROM p LEFT JOIN t ON p.q = t.q AND p.i = t.i
          WHERE p.rk <= {K} GROUP BY p.q
        ), ideal AS (
          SELECT q, SUM(rel / log2(irk + 1)) AS idcg FROM (
            SELECT q, rel,
                   row_number() OVER (PARTITION BY q ORDER BY rel DESC, i) AS irk
            FROM t WHERE rel > 0) s
          WHERE irk <= {K} GROUP BY q
        )
        SELECT ideal.q,
               COALESCE(dcg.dcg, 0) / idcg AS ndcg
        FROM ideal LEFT JOIN dcg ON ideal.q = dcg.q
        """).fetchall()
    }
    got = {
        r["query_id"]: r["ndcg_at_k"]
        for r in ranking_metrics(p, t, k=K).collect()
        if r["n_relevant"] > 0
    }
    ok = set(got) == set(want) and all(
        abs(got[q] - want[q]) < 1e-6 for q in want
    )
    record_opcheck("ranking_metrics_ndcg_duckdb", len(want), ok)
    assert ok


def test_ranking_metrics_exp_gain_and_summary(spark, frames):
    p, t = frames
    got = {
        r["query_id"]: r["ndcg_at_k"]
        for r in ranking_metrics(p, t, k=K, exp_gain=True).collect()
    }
    want = _python_replay(exp_gain=True)
    for q in want:
        assert got[q] == pytest.approx(want[q]["ndcg"], abs=1e-6), q
    # graded q5: exp gain re-weights the top item more than linear
    summ = ranking_metrics_summary(p, t, k=K).collect()[0]
    w = _python_replay()
    assert summ["n_queries"] == len(w)
    assert summ["mean_ndcg_at_k"] == pytest.approx(
        sum(x["ndcg"] for x in w.values()) / len(w), abs=1e-5
    )
    assert summ["mean_mrr"] == pytest.approx(
        sum(x["mrr"] for x in w.values()) / len(w), abs=1e-5
    )


def test_ranking_metrics_validation(spark, frames):
    p, t = frames
    with pytest.raises(ValueError):
        ranking_metrics(p, t, k=0)

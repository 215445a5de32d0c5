"""Distributed k-means (operators/clustering.py): the whole fit is
deterministic (hash-ordered init, no RNG), so an independent numpy
replay of the same algorithm over the same rows must agree to FP
tolerance — and assignments exactly, on well-separated data."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.clustering import (
    assign_clusters,
    cluster_profile,
    kmeans_fit,
    kmeans_fit_assign,
)

DIM = 8
N = 120


def _vec(i: int) -> list[float]:
    """Deterministic point: one-hot direction (i % 3) plus a small
    deterministic jitter — three well-separated direction clusters."""
    base = [0.0] * DIM
    base[(i % 3) * 2] = 1.0
    return [
        round(b + ((i * 7 + j * 13) % 5 - 2) / 100.0, 6)
        for j, b in enumerate(base)
    ]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(N)], "vec_id long, embedding array<double>"
    )


def _unit(M):
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return np.where(n > 0, M / np.where(n > 0, n, 1.0), M)


def _numpy_replay(k: int, iters: int):
    """The exact algorithm, independently: md5-ordered sample, maximin
    seeding (first row, then farthest-from-nearest-chosen, ties →
    first index), spherical assignment (argmax cosine, first-index
    ties), mean of unit rows, renormalize, empty cells keep their
    centroid."""
    X = np.array([_vec(i) for i in range(N)], dtype=np.float64)
    order = sorted(
        range(N), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    S = _unit(X[order].copy())  # sample cap 1024 > N: whole corpus
    chosen = [0]
    d = 1.0 - S @ S[0]
    for _ in range(k - 1):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, 1.0 - S @ S[nxt])
    C = S[chosen].copy()
    Xu = _unit(X)
    for _ in range(iters):
        lab = np.argmin(-(Xu @ C.T), axis=1)
        new_C = C.copy()
        for j in range(k):
            if (lab == j).any():
                new_C[j] = Xu[lab == j].mean(axis=0)
        C = _unit(new_C)
    return C, np.argmin(-(Xu @ C.T), axis=1)


def test_kmeans_matches_numpy_replay(spark, vec_df):
    iters = 6
    got = np.asarray(kmeans_fit(vec_df, 3, iters=iters, tol=0.0))
    want, want_lab = _numpy_replay(3, iters)
    cent_ok = np.allclose(got, want, atol=1e-8)

    assigned = assign_clusters(vec_df, got)
    got_lab = {
        r["vec_id"]: r["cluster"] for r in assigned.collect()
    }
    lab_ok = all(got_lab[i] == want_lab[i] for i in range(N))
    record_opcheck(
        "kmeans_fit", N, cent_ok and lab_ok, oracle="numpy-replay"
    )
    assert cent_ok
    assert lab_ok
    # well-separated data: each direction cluster is pure
    by_dir = {}
    for i in range(N):
        by_dir.setdefault(i % 3, set()).add(got_lab[i])
    assert all(len(s) == 1 for s in by_dir.values())
    assert len({s.pop() for s in by_dir.values()}) == 3


def test_assign_clusters_is_projection(spark, vec_df):
    cent = [[1.0] + [0.0] * (DIM - 1), [0.0, 0.0, 1.0] + [0.0] * (DIM - 3)]
    out = assign_clusters(vec_df, cent)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: a pure projection
    assert out.columns == ["vec_id", "embedding", "cluster"]


def test_assign_clusters_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, [[1.0, 0.0], [0.0, 1.0]]).collect()
    }
    assert got == {1: 0, 2: None, 3: None}


def test_kmeans_fit_assign_and_profile(spark, vec_df):
    cent, assigned = kmeans_fit_assign(vec_df, 3, iters=4)
    prof = {
        r["cluster"]: r["n_rows"] for r in cluster_profile(assigned).collect()
    }
    assert sum(prof.values()) == N
    assert len(prof) == 3 and all(v == N // 3 for v in prof.values())


def test_kmeans_euclidean_mode(spark):
    # two magnitude-separated blobs that SPHERICAL clustering cannot
    # split (same direction): euclidean mode must
    rows = [(i, [10.0 + (i % 3) / 10.0, 0.0]) for i in range(20)] + [
        (100 + i, [1.0 + (i % 3) / 10.0, 0.0]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = kmeans_fit(df, 2, iters=10, spherical=False)
    xs = sorted(c[0] for c in cent)
    assert abs(xs[0] - 1.1) < 0.2 and abs(xs[1] - 10.1) < 0.2
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, cent, spherical=False).collect()
    }
    assert len({got[i] for i in range(20)}) == 1
    assert len({got[100 + i] for i in range(20)}) == 1
    assert got[0] != got[100]


def test_kmeans_validation(spark, vec_df):
    with pytest.raises(ValueError):
        kmeans_fit(vec_df, 0)
    with pytest.raises(ValueError):
        kmeans_fit(vec_df.limit(2), 5)

"""DBSCAN (operators/density.py): exact python replay on seeded
blobs, hand case, cross-cell cluster, guard + validation."""

from __future__ import annotations

import random

import pytest

from data_export_tool_spark.operators.density import dbscan, py_dbscan


def _blobs(seed=37, n_per=60, noise=40):
    rng = random.Random(seed)
    pts = []
    pid = 0
    for cx, cy in [(0.0, 0.0), (10.0, 10.0), (20.0, 0.0)]:
        for _ in range(n_per):
            pts.append(
                (pid, cx + rng.gauss(0, 0.5), cy + rng.gauss(0, 0.5))
            )
            pid += 1
    for _ in range(noise):
        pts.append((pid, rng.uniform(-5, 25), rng.uniform(-5, 15)))
        pid += 1
    return pts


def _collect(df, id_col="id"):
    return {
        r[id_col]: (r["cluster_id"], r["is_core"]) for r in df.collect()
    }


def test_dbscan_hand_case(spark):
    # tight pair + far singleton; min_pts=2 -> pair is a 2-core
    # cluster, singleton is noise
    rows = [(1, 0.0, 0.0), (2, 0.1, 0.0), (3, 50.0, 50.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = _collect(dbscan(df, "id", "x", "y", eps=1.0, min_pts=2))
    assert got == {1: (1, True), 2: (1, True), 3: (None, False)}
    # min_pts=1: every point is its own (or merged) core cluster
    got1 = _collect(dbscan(df, "id", "x", "y", eps=1.0, min_pts=1))
    assert got1 == {1: (1, True), 2: (1, True), 3: (3, True)}


def test_dbscan_border_min_label(spark):
    # two cores 1,2 (mutual, min_pts=2); border 9 within eps of both
    # cores' clusters... single cluster here, but check border flag:
    # point 9 has only ONE neighbor (core 2) so it is border not core
    rows = [(1, 0.0, 0.0), (2, 0.5, 0.0), (9, 1.3, 0.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = _collect(dbscan(df, "id", "x", "y", eps=1.0, min_pts=3))
    # 1: nbrs {2} -> not core; 2: nbrs {1, 9} -> core; 9: nbrs {2} ->
    # border of 2's cluster (isolated core -> label = own id 2)
    assert got == {1: (2, False), 2: (2, True), 9: (2, False)}


def test_dbscan_cross_cell_cluster(spark):
    # chain crossing several eps-cells: all one cluster
    rows = [(i, i * 0.9, 0.0) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = _collect(dbscan(df, "id", "x", "y", eps=1.0, min_pts=2))
    labels = {v[0] for v in got.values()}
    assert labels == {0}
    assert all(v[1] for v in got.values())


def test_dbscan_replay_oracle(spark):
    pts = _blobs()
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = _collect(dbscan(df, "id", "x", "y", eps=1.2, min_pts=5))
    want = py_dbscan(pts, eps=1.2, min_pts=5)
    assert got == want
    # non-vacuous: 3 planted blobs found, some noise, some borders
    blobs = {v[0] for v in want.values() if v[0] is not None}
    assert len(blobs) >= 3
    assert any(v[0] is None for v in want.values())
    from tests.conftest import record_opcheck

    record_opcheck(
        "dbscan", len(want), True, oracle="python-reference",
        value=float(len(blobs)),
    )


def test_dbscan_guard_and_validation(spark):
    rows = [(i, 0.0, 0.0) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    with pytest.raises(ValueError, match="max_cell_points"):
        dbscan(df, "id", "x", "y", eps=1.0, min_pts=2,
               max_cell_points=10)
    with pytest.raises(ValueError, match="eps"):
        dbscan(df, "id", "x", "y", eps=0.0, min_pts=2)
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, "id", "x", "y", eps=1.0, min_pts=0)

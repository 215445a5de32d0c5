"""Deterministic random walks (operators/walks.py): exact python md5
replay, edge-validity law, sink/directed semantics, determinism, and
validation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.walks import random_walks


def _h32(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[8:16], 16)


def _walks_python(edges, n_walks, walk_length, seed, undirected):
    und = {(a, b) for a, b in edges if a != b}
    if undirected:
        und |= {(b, a) for a, b in und}
    adj: dict = {}
    for a, b in sorted(und):
        adj.setdefault(a, []).append(b)
    rows = []
    for start in adj:
        for w in range(n_walks):
            wid = f"{start}#{w}"
            node = start
            rows.append((wid, start, 0, node))
            for s in range(1, walk_length):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                r = _h32(f"{seed}{wid}{node}{s}") % len(nbrs)
                node = nbrs[r]
                rows.append((wid, start, s, node))
    return sorted(rows)


def test_walks_match_python_replay(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges_df = (
        li.alias("l")
        .join(li.alias("r"), "l_orderkey")
        .where("l.l_partkey < r.l_partkey")
        .selectExpr("l.l_partkey AS src", "r.l_partkey AS dst")
    )
    got = sorted(
        (r["walk_id"], r["start"], r["step"], r["node"])
        for r in random_walks(edges_df, n_walks=2, walk_length=4).collect()
    )
    want = _walks_python(
        [(r["src"], r["dst"]) for r in edges_df.collect()],
        n_walks=2, walk_length=4, seed=42, undirected=True,
    )
    ok = got == want
    record_opcheck("random_walks", len(want), ok, oracle="python-reference")
    assert ok and len(want) > 0


def test_walks_edges_are_real_and_deterministic(spark):
    edges = [(a, b) for a in range(6) for b in range(6) if a < b and (a + b) % 3]
    df = spark.createDataFrame(edges, "src long, dst long")
    out1 = random_walks(df, n_walks=3, walk_length=5).collect()
    out2 = random_walks(df, n_walks=3, walk_length=5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    und = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    byw: dict = {}
    for r in out1:
        byw.setdefault(r["walk_id"], []).append((r["step"], r["node"]))
    for wid, steps in byw.items():
        steps.sort()
        assert [s for s, _ in steps] == list(range(len(steps)))
        for (s1, n1), (_, n2) in zip(steps, steps[1:]):
            assert (n1, n2) in und, f"walk {wid} used a non-edge {n1}->{n2}"


def test_walks_directed_sink_truncates(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = random_walks(df, n_walks=1, walk_length=5, undirected=False).collect()
    byw = {}
    for r in out:
        byw.setdefault(r["start"], []).append((r["step"], r["node"]))
    # starts only from nodes with out-edges (1 and 2); the walk from 1
    # reaches sink 3 at step 2 and stops — step 2 IS emitted
    assert set(byw) == {1, 2}
    assert sorted(byw[1]) == [(0, 1), (1, 2), (2, 3)]
    assert sorted(byw[2]) == [(0, 2), (1, 3)]


def test_walks_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, n_walks=0)
    with pytest.raises(ValueError):
        random_walks(df, walk_length=0)


def test_walks_adjacency_no_single_key_sort(spark):
    """VERDICT r6 #2 plan pin: the adjacency rank must be the
    two-phase range form — NO window partitioned solely by u and
    ordered by v (the shape that serializes a mega-hub's neighbor
    list onto one task). Every row_number window must carry the range
    key in its partition spec; the only u-partitioned window is the
    offsets prefix sum, whose partitions hold <= num_ranges metadata
    rows."""
    import re

    from data_export_tool_spark.operators.walks import _indexed_adjacency

    e = (
        spark.range(500)
        .selectExpr("id % 50 AS u", "id AS v")
        .where("u != v")
    )
    adj, deg = _indexed_adjacency(e, num_ranges=8)
    plan = adj._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the adjacency plan"
    for spec in specs:
        head = spec.split(" ASC")[0]
        cols = [c.strip() for c in head.split(",")]
        if any(c.startswith("v#") for c in cols):
            # a window ORDERED on v must be partitioned by (u, __rng)
            assert any(c.startswith("__rng#") for c in cols), spec
    # the degree path must not window over raw edges at all
    deg_plan = deg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", deg_plan):
        assert "v#" not in spec.split(" ASC")[0], spec
    # and the rank output is identical to the classic single-window form
    from pyspark.sql import Window

    classic = e.select(
        "u", "v",
        (F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1).alias("r"),
    )
    got = {(r["u"], r["v"]): r["__rank"] for r in adj.collect()}
    want = {(r["u"], r["v"]): r["r"] for r in classic.collect()}
    assert got == want

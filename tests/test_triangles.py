"""Triangle counting (operators/triangles.py): clique ground truth,
edge-hygiene contract, and an exact DuckDB brute-force replay over the
lineitem co-purchase projection graph."""

from __future__ import annotations

import duckdb

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.triangles import triangle_counts


def test_triangles_k4_plus_pendant(spark):
    # K4 on 1..4 (every node in 3 triangles, clustering 1.0) plus a
    # pendant 5-1 edge (degree 1 -> clustering 0)
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b] + [(5, 1)]
    df = spark.createDataFrame(edges, "s long, d long")
    got = {r["node"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_counts(df, "s", "d").collect()}
    assert got[1] == (4, 3, 2 * 3 / (4 * 3))
    for n in (2, 3, 4):
        assert got[n] == (3, 3, 1.0)
    assert got[5] == (1, 0, 0.0)


def test_triangles_edge_hygiene(spark):
    # self-loop, duplicate and reversed edges must collapse; NULLs drop
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 3), (None, 1), (4, None)],
        "s long, d long",
    )
    got = {r["node"]: (r["degree"], r["triangles"])
           for r in triangle_counts(df, "s", "d").collect()}
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_triangles_match_duckdb_copurchase(spark, sf_dir):
    """Co-purchase projection: parts are adjacent when they share an
    order; triangle counts vs a brute-force a<b<c DuckDB join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.alias("l")
        .join(li.alias("r"), "l_orderkey")
        .where("l.l_partkey < r.l_partkey")
        .selectExpr("l.l_partkey AS s", "r.l_partkey AS d")
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], round(r["clustering"], 9))
        for r in triangle_counts(edges, "s", "d").collect()
    }
    want = {
        int(n): (int(d), int(t), round(float(c), 9))
        for n, d, t, c in duckdb.sql(
            f"""
        WITH e AS (
          SELECT DISTINCT least(l.l_partkey, r.l_partkey) AS a,
                          greatest(l.l_partkey, r.l_partkey) AS b
          FROM read_parquet('{sf_dir}/lineitem.parquet') l
          JOIN read_parquet('{sf_dir}/lineitem.parquet') r
            USING (l_orderkey)
          WHERE l.l_partkey < r.l_partkey
        ),
        deg AS (
          SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
          ) GROUP BY 1
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        pt AS (
          SELECT node, count(*) AS t FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
          ) GROUP BY 1
        )
        SELECT deg.node, deg.degree, coalesce(pt.t, 0) AS triangles,
               CASE WHEN deg.degree >= 2
                    THEN 2.0 * coalesce(pt.t, 0)
                         / (deg.degree * (deg.degree - 1))
                    ELSE 0.0 END AS clustering
        FROM deg LEFT JOIN pt USING (node)
        """
        ).fetchall()
    }
    ok = got == want
    record_opcheck("triangle_counts", len(want), ok)
    assert ok and len(want) > 0
    assert sum(t for _, t, _ in got.values()) % 3 == 0  # 3 nodes per triangle


def test_triangles_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "s long, d long")
    plan = (
        triangle_counts(df, "s", "d")._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan

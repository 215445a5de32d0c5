"""Golden-record survivorship (operators/survivorship.py): exact
DuckDB replay of every rule, NULL-never-wins law, mode tie-break, and
validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.survivorship import golden_record

ROWS = [
    # cluster, ts, email,            phone,   score
    (1, "2024-01-01", "old@a.com",   None,    5.0),
    (1, "2024-03-01", "new@a.com",   "111",   3.0),
    (1, "2024-02-01", None,          "222",   9.0),
    (2, "2024-01-01", None,          None,    1.0),   # all-NULL email
    (2, "2024-02-01", None,          "333",   2.0),
    (3, "2024-01-01", "x@c.com",     "444",   7.0),
    # cluster 4: mode tie (two 'a', two 'b') -> smallest value 'a'
    (4, "2024-01-01", "a",           "1",     1.0),
    (4, "2024-01-02", "a",           "1",     1.0),
    (4, "2024-01-03", "b",           "2",     1.0),
    (4, "2024-01-04", "b",           "3",     1.0),
    (None, "2024-01-01", "drop@me",  "999",   0.0),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "cluster long, ts string, email string, phone string, score double"
    ).withColumn("ts", F.col("ts").cast("date"))


def test_golden_record_matches_duckdb(spark, df):
    import duckdb

    out = golden_record(
        df,
        "cluster",
        {"email": "latest", "phone": "mode", "score": "max"},
        ts_col="ts",
    )
    got = {
        r["cluster"]: (r["n_members"], r["email"], r["phone"], r["score"])
        for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(cluster BIGINT, ts DATE, email VARCHAR,"
        " phone VARCHAR, score DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", ROWS)
    want_rows = con.sql("""
      WITH latest AS (
        SELECT cluster, email FROM (
          SELECT cluster, email,
                 row_number() OVER (PARTITION BY cluster
                                    ORDER BY ts DESC, email DESC) AS rk
          FROM t WHERE cluster IS NOT NULL AND email IS NOT NULL) s
        WHERE rk = 1
      ), mode_ AS (
        SELECT cluster, phone FROM (
          SELECT cluster, phone, COUNT(*) AS c,
                 row_number() OVER (PARTITION BY cluster
                                    ORDER BY COUNT(*) DESC, phone) AS rk
          FROM t WHERE cluster IS NOT NULL AND phone IS NOT NULL
          GROUP BY cluster, phone) s WHERE rk = 1
      ), agg AS (
        SELECT cluster, COUNT(*) AS n, MAX(score) AS score
        FROM t WHERE cluster IS NOT NULL GROUP BY cluster
      )
      SELECT agg.cluster, n, latest.email, mode_.phone, score
      FROM agg LEFT JOIN latest USING (cluster) LEFT JOIN mode_ USING (cluster)
    """).fetchall()
    want = {int(c): (int(n), e, p, s) for c, n, e, p, s in want_rows}
    ok = got == want
    record_opcheck("golden_record", len(want) * 4, ok)
    assert ok, (got, want)
    # NULL-never-wins: cluster 1's latest email is new@a.com even
    # though a later-scoring NULL row exists; cluster 2's email is NULL
    assert got[1][1] == "new@a.com"
    assert got[2][1] is None
    # mode tie -> smallest value
    assert got[4][2] == "1"
    # NULL cluster rows excluded
    assert None not in got


def test_golden_record_contracts(spark, df):
    with pytest.raises(ValueError):
        golden_record(df, "cluster", {})
    with pytest.raises(ValueError):
        golden_record(df, "cluster", {"email": "nope"})
    with pytest.raises(ValueError):
        golden_record(df, "cluster", {"email": "latest"})  # no ts_col
    # earliest/min work and agree with direct aggregates
    out = {
        r["cluster"]: (r["email"], r["score"])
        for r in golden_record(
            df, "cluster", {"email": "earliest", "score": "min"}, ts_col="ts"
        ).collect()
    }
    assert out[1] == ("old@a.com", 3.0)
    assert out[2] == (None, 1.0)

"""Sequence mining (operators/seqmine.py): exact DuckDB lead-window
replay of gram counts/support, next-event conditional table, tie
ordering, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.seqmine import (
    SEP,
    frequent_event_ngrams,
    next_event_table,
)


def test_ngrams_match_duckdb(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    got = {
        (r["n"], tuple(r["gram"])): (r["n_occurrences"], r["n_users"])
        for r in frequent_event_ngrams(
            ev, max_n=3, min_support=2
        ).collect()
    }
    assert got, "no frequent grams at sf0.001?"
    con = duckdb.connect()
    want_rows = con.sql(f"""
      WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM '{sf_dir}/events.parquet'
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
      ), led AS (
        SELECT user_id, event_type AS e0,
               lead(event_type, 1) OVER w AS e1,
               lead(event_type, 2) OVER w AS e2
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
      ), grams AS (
        SELECT 2 AS n, user_id, e0 || '{SEP}' || e1 AS g FROM led WHERE e1 IS NOT NULL
        UNION ALL
        SELECT 3, user_id, e0 || '{SEP}' || e1 || '{SEP}' || e2
        FROM led WHERE e1 IS NOT NULL AND e2 IS NOT NULL
      )
      SELECT n, g, COUNT(*) AS occ, COUNT(DISTINCT user_id) AS sup
      FROM grams GROUP BY n, g HAVING COUNT(DISTINCT user_id) >= 2
    """).fetchall()
    want = {
        (int(n), tuple(g.split(SEP))): (int(occ), int(sup))
        for n, g, occ, sup in want_rows
    }
    ok = got == want
    record_opcheck("frequent_event_ngrams", len(want), ok)
    assert ok


def test_next_event_table_matches_duckdb(spark, sf_dir):
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    got = {
        (tuple(r["context"]), r["next_event"]): (r["n"], r["prob"], r["rank"])
        for r in next_event_table(ev, context_n=2).collect()
    }
    con = duckdb.connect()
    want_rows = con.sql(f"""
      WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM '{sf_dir}/events.parquet'
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
      ), led AS (
        SELECT event_type AS e0, lead(event_type, 1) OVER w AS e1,
               lead(event_type, 2) OVER w AS e2
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
      ), c AS (
        SELECT e0 || '{SEP}' || e1 AS ctx, e2 AS nxt, COUNT(*) AS n
        FROM led WHERE e1 IS NOT NULL AND e2 IS NOT NULL GROUP BY 1, 2
      )
      SELECT ctx, nxt, n,
             ROUND(n / SUM(n) OVER (PARTITION BY ctx), 6) AS prob,
             row_number() OVER (PARTITION BY ctx ORDER BY n DESC, nxt) AS rk
      FROM c
    """).fetchall()
    want = {
        (tuple(ctx.split(SEP)), nxt): (int(n), float(p), int(rk))
        for ctx, nxt, n, p, rk in want_rows
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0]
        and got[k][2] == want[k][2]
        and abs(got[k][1] - want[k][1]) < 1e-6
        for k in want
    )
    record_opcheck("next_event_table", len(want), ok)
    assert ok


def test_seqmine_tie_and_null_contracts(spark):
    rows = [
        # same-ts burst: order must break by event name (a<b<c)
        (1, "2024-01-01 00:00:00", "c"),
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:00:00", "b"),
        (2, "2024-01-01 00:00:00", "a"),
        (2, "2024-01-01 00:01:00", "b"),
        (None, "2024-01-01 00:00:00", "a"),
        (3, None, "a"),
        (3, "2024-01-01 00:00:00", None),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    grams = {
        tuple(r["gram"]): r["n_users"]
        for r in frequent_event_ngrams(ev, max_n=2, min_support=1).collect()
    }
    # user 1 yields a->b, b->c (sorted burst); user 2 yields a->b
    assert grams == {("a", "b"): 2, ("b", "c"): 1}
    nxt = {
        (tuple(r["context"]), r["next_event"]): r["prob"]
        for r in next_event_table(ev, context_n=1).collect()
    }
    assert nxt[(("a",), "b")] == 1.0
    with pytest.raises(ValueError):
        frequent_event_ngrams(ev, max_n=1)
    with pytest.raises(ValueError):
        next_event_table(ev, context_n=0)

"""Transition-matrix analytics (operators/sequences.py) against the
DuckDB LEAD-window truth over the real events table, plus a hot-user
batch-boundary pin and plan-shape checks."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.operators.sequences import transition_counts


def test_transitions_match_duckdb(spark, sf_dir):
    ev = Catalog(spark, sf_dir).load("events")
    got = {
        (r["prev_event"], r["next_event"]): (
            r["n_transitions"],
            r["probability"],
        )
        for r in transition_counts(ev).collect()
    }
    want = {
        (p, x): (int(n), round(float(pr), 6))
        for p, x, n, pr in duckdb.sql(
            f"""
            WITH seq AS (
              SELECT event_type AS p,
                     LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS x
              FROM read_parquet('{sf_dir}/events.parquet')
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
                AND event_type IS NOT NULL
            ), cnt AS (
              SELECT p, x, COUNT(*) AS n FROM seq
              WHERE x IS NOT NULL GROUP BY p, x
            )
            SELECT p, x, n, n / SUM(n) OVER (PARTITION BY p) FROM cnt
            """
        ).fetchall()
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0] and abs(got[k][1] - want[k][1]) < 1e-6
        for k in want
    )
    record_opcheck("transition_counts", len(want), ok)
    assert ok
    # each matrix row sums to ~1 over observed successors
    by_prev: dict = {}
    for (p, _), (_, pr) in got.items():
        by_prev[p] = by_prev.get(p, 0.0) + pr
    assert all(abs(s - 1.0) < 1e-4 for s in by_prev.values())


def test_transitions_hot_user_closed_form(spark):
    # One 100k-event user alternating a,b crosses many Arrow batches;
    # the carry across batch boundaries must not drop or double pairs.
    n = 100_000
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=i), "a" if i % 2 == 0 else "b", i)
        for i in range(n)
    ]
    rows += [(2, base, "a", n), (2, base + dt.timedelta(seconds=1), "a", n + 1)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r["prev_event"], r["next_event"]): r["n_transitions"]
        for r in transition_counts(df).collect()
    }
    assert got == {("a", "b"): n // 2, ("b", "a"): n // 2 - 1, ("a", "a"): 1}


def test_transitions_null_and_tie_contract(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (None, base, "a", 1),                      # NULL user: excluded
            (7, None, "b", 2),                         # NULL ts: excluded
            (7, base, None, 3),                        # NULL type: excluded
            (7, base, "x", 5),                         # tie on ts:
            (7, base, "y", 4),                         #   event_id orders y→x
            (7, base + dt.timedelta(seconds=1), "z", 6),
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    got = {
        (r["prev_event"], r["next_event"]): r["n_transitions"]
        for r in transition_counts(df).collect()
    }
    assert got == {("y", "x"): 1, ("x", "z"): 1}


def test_transitions_single_exchange(spark, sf_dir):
    ev = Catalog(spark, sf_dir).load("events")
    plan = transition_counts(ev)._jdf.queryExecution().executedPlan().toString()
    # ONE scan + ONE fold (no recomputed subtree for the row totals),
    # and only bounded exchanges: user repartition, the tiny partial-
    # count rollup, and the alphabet-sized normalization window
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_session_paths_match_duckdb(spark, sf_dir):
    from data_export_tool_spark.operators.sequences import session_paths

    ev = Catalog(spark, sf_dir).load("events")
    gap, steps = 1800, 4
    got = {
        (r["path"], r["n_steps"]): r["n_sessions"]
        for r in session_paths(ev, gap_seconds=gap, max_steps=steps).collect()
    }
    want = {
        (p, int(ns)): int(n)
        for p, ns, n in duckdb.sql(
            f"""
            WITH e AS (
              SELECT user_id, ts, event_type, event_id,
                     epoch_ms(ts) AS ms
              FROM read_parquet('{sf_dir}/events.parquet')
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
                AND event_type IS NOT NULL
            ), marked AS (
              SELECT *, CASE WHEN ms - LAG(ms) OVER w > {gap * 1000}
                              OR LAG(ms) OVER w IS NULL
                         THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            ), ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
              FROM sess
            ), paths AS (
              SELECT user_id, sid,
                     string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
                     COUNT(*) AS n_steps
              FROM ranked WHERE rn <= {steps} GROUP BY user_id, sid
            )
            SELECT path, n_steps, COUNT(*) FROM paths GROUP BY path, n_steps
            """
        ).fetchall()
    }
    ok = got == want and len(want) > 0
    record_opcheck("session_paths", len(want), ok)
    assert ok, (len(got), len(want))


def test_session_paths_truncation_and_flush(spark):
    import datetime as dt

    from data_export_tool_spark.operators.sequences import session_paths

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: one 8-event session (truncates to 3), then a gap, then
    # a 2-event session
    for i in range(8):
        rows.append((1, base + dt.timedelta(seconds=i), f"e{i}", i))
    rows.append((1, base + dt.timedelta(hours=2), "x", 100))
    rows.append((1, base + dt.timedelta(hours=2, seconds=1), "y", 101))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r["path"], r["n_steps"]): r["n_sessions"]
        for r in session_paths(
            df, gap_seconds=60, max_steps=3, max_partial_paths=1
        ).collect()
    }
    # max_partial_paths=1 forces a drain per batch — counts must still
    # re-aggregate exactly
    assert got == {("e0>e1>e2", 3): 1, ("x>y", 2): 1}


def test_session_paths_single_exchange(spark, sf_dir):
    from data_export_tool_spark.operators.sequences import session_paths

    ev = Catalog(spark, sf_dir).load("events")
    plan = (
        session_paths(ev)._jdf.queryExecution().executedPlan().toString()
    )
    # one scan + one fold; exchanges: user repartition + partial rollup
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Window" not in plan, plan

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

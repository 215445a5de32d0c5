"""Exclusion funnel (operators/funnel.py funnel_excluding): replay on
real events, the greedy-is-wrong revival law, contracts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.funnel import (
    funnel_excluding,
    py_funnel_excluding,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_revival_law(spark):
    # A@1  C@2  A@3  B@4 : the early anchor dies, the later A revives
    # the chain — greedy earliest-chain would report no conversion
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "ticket"),
        (1, _ts(3), "view"), (1, _ts(4), "purchase"),
        # user 2: C lands between the only A and B -> blocked
        (2, _ts(1), "view"), (2, _ts(2), "ticket"),
        (2, _ts(3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["steps_reached"], r["converted"], r["convert_ts"])
        for r in funnel_excluding(
            df, ["view", "purchase"], ["ticket"]
        ).collect()
    }
    assert got[1] == (2, True, _ts(4))
    assert got[2] == (1, False, None)


def test_three_step_and_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    steps = ["view", "click", "purchase"]
    excl = ["signup"]
    got = {
        r["user_id"]: (
            r["steps_reached"], r["converted"], r["convert_ts"]
        )
        for r in funnel_excluding(ev, steps, excl).collect()
    }
    rows = ev.where(
        F.col("event_type").isin(steps + excl)
        & F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", "ts", "event_type").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_type"])
        )
    want = {}
    for u, evs in by_user.items():
        reached, cts = py_funnel_excluding(evs, steps, excl)
        want[u] = (reached, cts is not None, cts)
    assert got == want
    # non-vacuous: some users convert, some are BLOCKED by the
    # exclusion (differ from the unconstrained funnel)
    assert any(v[1] for v in want.values())
    from data_export_tool_spark.operators.funnel import funnel_steps

    plain = funnel_steps(ev, steps)
    n_plain = plain.where(F.col("n_steps") == 3).count()
    n_excl = sum(1 for v in want.values() if v[1])
    assert n_excl < n_plain  # the exclusion must bite
    from tests.conftest import record_opcheck

    record_opcheck(
        "funnel_excluding", len(want), True,
        oracle="python-reference", value=float(n_excl),
    )


def test_funnel_excluding_validation(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "a")], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError, match="two steps"):
        funnel_excluding(df, ["a"], ["c"])
    with pytest.raises(ValueError, match="overlap"):
        funnel_excluding(df, ["a", "b"], ["b"])
    with pytest.raises(ValueError, match="exclude"):
        funnel_excluding(df, ["a", "b"], [])
    with pytest.raises(ValueError, match="duplicate"):
        funnel_excluding(df, ["a", "a"], ["c"])

"""Thread reconstruction (operators/threads.py) vs a DuckDB recursive
CTE — root, depth, resolved verdict — plus the corruption contracts
(dangling parents, cycles) and the log-round scale law."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.threads import (
    resolve_threads,
    thread_stats,
)


def _oracle(rows):
    """Recursive-CTE replay: walk each message to its root, counting
    hops; dangling parents terminate the walk AT the dangling id."""
    con = duckdb.connect()
    con.execute("CREATE TABLE m(id BIGINT, p BIGINT)")
    con.executemany("INSERT INTO m VALUES (?, ?)", rows)
    got = con.sql(
        """
        WITH RECURSIVE walk(id, cur, d) AS (
          SELECT id, id, 0 FROM m
          UNION ALL
          SELECT w.id, m.p, w.d + 1
          FROM walk w JOIN m ON m.id = w.cur
          WHERE m.p IS NOT NULL AND w.d < 100
        ),
        tops AS (
          SELECT id, cur, d, ROW_NUMBER() OVER
            (PARTITION BY id ORDER BY d DESC) AS rn
          FROM walk
        )
        SELECT id, cur AS root, d FROM tops WHERE rn = 1
        """
    ).fetchall()
    return {int(i): (int(r), int(d)) for i, r, d in got}


def test_resolve_threads_matches_recursive_oracle(spark):
    # forest: two real trees + a dangling-parent fragment
    rows = [
        (1, None), (2, 1), (3, 1), (4, 2), (5, 4), (6, 5),     # tree A
        (10, None), (11, 10),                                   # tree B
        (20, 99), (21, 20), (22, 21),                           # dangling 99
        (30, None),                                             # singleton
    ]
    df = spark.createDataFrame(rows, "msg_id long, parent_id long")
    got = {
        r["msg_id"]: (r["root_id"], r["depth"], r["resolved"])
        for r in resolve_threads(df).collect()
    }
    want = _oracle(rows)
    assert set(got) == set(want)
    for i, (root, d) in want.items():
        assert got[i] == (root, d, True), (i, got[i], (root, d))
    # the dangling fragment roots at the MISSING id, counting its edge
    assert got[22] == (99, 3, True)
    record_opcheck(
        "resolve_threads", len(want), True, oracle="duckdb-recursive-cte"
    )

    # thread rollup
    stats = {r["root_id"]: r for r in thread_stats(df).collect()}
    assert stats[1]["n_messages"] == 6 and stats[1]["max_depth"] == 4
    assert stats[99]["n_messages"] == 3 and stats[99]["max_depth"] == 3
    assert stats[30]["n_messages"] == 1 and stats[30]["max_depth"] == 0
    assert all(r["n_unresolved"] == 0 for r in stats.values())


def test_resolve_threads_cycles_fail_loudly(spark):
    rows = [(1, 2), (2, 3), (3, 1), (4, 1), (10, None), (11, 10)]
    df = spark.createDataFrame(rows, "msg_id long, parent_id long")
    got = {
        r["msg_id"]: (r["root_id"], r["depth"], r["resolved"])
        for r in resolve_threads(df).collect()
    }
    # in-cycle members AND their descendants come back unresolved with
    # their own id as root — never an arbitrary in-cycle root
    for i in (1, 2, 3, 4):
        assert got[i] == (i, None, False), (i, got[i])
    assert got[10] == (10, 0, True) and got[11] == (10, 1, True)


def test_resolve_threads_log_rounds_deep_chain(spark):
    """A depth-300 chain must resolve (2^14 bound) with exact depths —
    the path-doubling law; and a tight max_rounds refuses honestly."""
    n = 300
    rows = [(i, i - 1 if i > 0 else None) for i in range(n)]
    df = spark.createDataFrame(rows, "msg_id long, parent_id long")
    got = {r["msg_id"]: r for r in resolve_threads(df).collect()}
    assert all(
        got[i]["root_id"] == 0 and got[i]["depth"] == i and got[i]["resolved"]
        for i in range(n)
    )
    shallow = {
        r["msg_id"]: r for r in resolve_threads(df, max_rounds=3).collect()
    }
    # guaranteed-resolvable depth is 2^(max_rounds - 1) = 4 (the done
    # flag propagates one round behind the pointer reaching the root)
    assert shallow[299]["resolved"] is False
    assert shallow[4]["resolved"] is True and shallow[4]["depth"] == 4

    with pytest.raises(ValueError):
        resolve_threads(df, max_rounds=0)

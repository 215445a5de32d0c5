"""Multi-touch attribution vs a full python reference over the same
collected events (all four credit models), plus hand-built boundary /
tie / unattributed edges."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.operators.attribution import attribute_conversions

CONV = "purchase"
TOUCHES = ["view", "click"]
LOOKBACK_S = 7 * 86400


def _py_attribution(rows, model):
    """rows: (user, ts, type). Returns {(user, conv_ts): [(touch_ts,
    touch_type, weight), ...]} with the module's contract."""
    convs = sorted({(u, ts) for u, ts, t in rows if t == CONV})
    touches = sorted(
        [(u, ts, t) for u, ts, t in rows if t in TOUCHES],
        key=lambda r: (r[1], r[2]),
    )
    out = {}
    for u, cts in convs:
        cand = [
            (ts, t)
            for uu, ts, t in touches
            if uu == u
            and ts <= cts
            and (cts - ts).total_seconds() < LOOKBACK_S
        ]
        k = len(cand)
        if k == 0:
            out[(u, cts)] = []
            continue
        if model == "last":
            out[(u, cts)] = [(*cand[-1], 1.0)]
        elif model == "first":
            out[(u, cts)] = [(*cand[0], 1.0)]
        elif model == "linear":
            out[(u, cts)] = [(*c, 1.0 / k) for c in cand]
        else:
            if k == 1:
                out[(u, cts)] = [(*cand[0], 1.0)]
            elif k == 2:
                out[(u, cts)] = [(*c, 0.5) for c in cand]
            else:
                out[(u, cts)] = (
                    [(*cand[0], 0.4)]
                    + [(*c, 0.2 / (k - 2)) for c in cand[1:-1]]
                    + [(*cand[-1], 0.4)]
                )
    return out


@pytest.mark.parametrize("model", ["last", "first", "linear", "position"])
def test_attribution_matches_python_reference(spark, sf_dir, model):
    ev = Catalog(spark, sf_dir).load("events")
    rows = [
        (r["user_id"], r["ts"], r["event_type"])
        for r in ev.select("user_id", "ts", "event_type").collect()
        if r["ts"] is not None and r["user_id"] is not None
    ]
    want = _py_attribution(rows, model)

    got = {}
    for r in attribute_conversions(
        ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()),
        CONV,
        TOUCHES,
        model=model,
    ).collect():
        key = (r["user"], r["conv_ts"])
        got.setdefault(key, [])
        if r["touch_ts"] is not None:
            got[key].append((r["touch_ts"], r["touch_type"], r["weight"]))
            assert abs(
                r["lag_sec"]
                - (r["conv_ts"] - r["touch_ts"]).total_seconds()
            ) < 1e-6

    assert set(got) == set(want)
    ok = True
    for key in want:
        g = sorted(got[key])
        w = sorted(want[key])
        ok = ok and len(g) == len(w)
        ok = ok and all(
            a[0] == b[0] and a[1] == b[1] and abs(a[2] - b[2]) < 1e-12
            for a, b in zip(g, w)
        )
        # credit conservation: weights of an attributed conversion sum to 1
        if w:
            ok = ok and abs(sum(x[2] for x in g) - 1.0) < 1e-9
    if model == "linear":
        record_opcheck(
            "attribute_conversions", len(want), bool(ok),
            oracle="python-reference",
        )
    assert ok


def test_attribution_boundaries_and_edges(spark):
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    df = spark.createDataFrame(
        [
            # u1: same-ts touch counts; strictly-after touch never does
            (1, s(0), "view"), (1, s(0), "purchase"), (1, s(1), "click"),
            # u2: exactly-lookback-old touch is OUTSIDE (exclusive)
            (2, s(0), "view"), (2, s(LOOKBACK_S), "purchase"),
            # u3: unattributed conversion
            (3, s(0), "purchase"),
            # u4: tie on ts across types → deterministic (type order)
            (4, s(0), "view"), (4, s(0), "click"), (4, s(5), "purchase"),
            # u5: U-shape with 4 touches
            (5, s(0), "view"), (5, s(1), "click"), (5, s(2), "view"),
            (5, s(3), "click"), (5, s(10), "purchase"),
            # duplicate conversion events collapse
            (6, s(0), "view"), (6, s(1), "purchase"), (6, s(1), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = attribute_conversions(df, CONV, TOUCHES, model="position")
    rows = got.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user"], []).append(r)

    assert len(by_user[1]) == 1 and by_user[1][0]["touch_ts"] == s(0)
    assert by_user[2][0]["touch_ts"] is None  # outside exclusive window
    assert by_user[2][0]["weight"] is None
    assert by_user[3][0]["touch_ts"] is None
    u5 = {r["touch_ts"]: r["weight"] for r in by_user[5]}
    assert abs(u5[s(0)] - 0.4) < 1e-12 and abs(u5[s(3)] - 0.4) < 1e-12
    assert abs(u5[s(1)] - 0.1) < 1e-12 and abs(u5[s(2)] - 0.1) < 1e-12
    assert len(by_user[6]) == 1  # collapsed duplicate conversion

    # first/last tie-break: same ts → "click" < "view" lexically
    first = attribute_conversions(df, CONV, TOUCHES, model="first").collect()
    last = attribute_conversions(df, CONV, TOUCHES, model="last").collect()
    f4 = [r for r in first if r["user"] == 4][0]
    l4 = [r for r in last if r["user"] == 4][0]
    assert f4["touch_type"] == "click" and l4["touch_type"] == "view"
    assert f4["n_touches"] == 2

    with pytest.raises(ValueError):
        attribute_conversions(df, CONV, TOUCHES, model="shapley")
    with pytest.raises(ValueError):
        attribute_conversions(df, CONV, [])
    with pytest.raises(ValueError):
        attribute_conversions(df, CONV, [CONV])


def test_attribution_plan_has_no_cartesian(spark, sf_dir):
    """The candidate stage must be the per-user equi+range join —
    never a cartesian."""
    from data_export_tool_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).load("events")
    plan = (
        attribute_conversions(ev, CONV, TOUCHES, model="linear")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # a nested-loop join would mean the user equi-key was not used
    assert "BroadcastNestedLoopJoin" not in plan

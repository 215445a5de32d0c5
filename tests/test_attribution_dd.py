"""Data-driven attribution (operators/attribution.py Markov removal +
Shapley): exact replays, hand-solvable chains, efficiency axiom."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.attribution import (
    markov_attribution,
    py_markov_removal,
    py_shapley_credits,
    shapley_attribution,
)

TOUCHES = ["view", "click", "signup"]


def _py_journeys(rows, conversion_type, touch_types):
    """Replay of the journey convention: per user sorted (ts, type);
    conversions close journeys; trailing touches are unconverted."""
    by_user = {}
    for u, ts, ty in rows:
        if ty == conversion_type or ty in touch_types:
            by_user.setdefault(u, []).append((ts, ty))
    journeys = []
    for u, evs in by_user.items():
        evs.sort()
        path = []
        for _, ty in evs:
            if ty == conversion_type:
                journeys.append((tuple(path), True))
                path = []
            else:
                path.append(ty)
        if path:
            journeys.append((tuple(path), False))
    return journeys


def _py_transitions(journeys):
    counts = {}
    for path, converted in journeys:
        walk = ["__start__", *path, "__conv__" if converted else "__null__"]
        for a, b in zip(walk, walk[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return [(a, b, n) for (a, b), n in counts.items()]


def test_markov_attribution_matches_python_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["channel"]: r
        for r in markov_attribution(ev, "purchase", TOUCHES).collect()
    }
    rows = [
        (r["user_id"], r["ts"], r["event_type"])
        for r in ev.select("user_id", "ts", "event_type").collect()
    ]
    journeys = _py_journeys(rows, "purchase", TOUCHES)
    trans = _py_transitions(journeys)
    ref = py_markov_removal(trans)
    total_conv = sum(n for _, d, n in trans if d == "__conv__")
    tot_removal = sum(ref["removal"].values())
    assert set(got) == set(ref["removal"])
    for c, r_ref in ref["removal"].items():
        assert got[c]["removal_effect"] == pytest.approx(r_ref, rel=1e-9)
        assert got[c]["p_conv"] == pytest.approx(ref["p_conv"], rel=1e-9)
        assert got[c]["total_conversions"] == total_conv
        assert got[c]["credit"] == pytest.approx(
            total_conv * r_ref / tot_removal, rel=1e-9
        )
    from tests.conftest import record_opcheck

    record_opcheck(
        "markov_attribution", len(rows), True, oracle="python-reference",
        value=ref["p_conv"],
    )


def test_markov_hand_solvable_chain(spark):
    # start -> A -> conv (1x); start -> B -> null (1x):
    # p_conv = 0.5; removing A kills all conversion (effect 1),
    # removing B none (effect 0) -> A gets all credit
    rows = [
        (1, "2024-01-01 00:00:00", "view"),      # A = view
        (1, "2024-01-01 00:01:00", "purchase"),
        (2, "2024-01-01 00:00:00", "click"),     # B = click
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["channel"]: r
        for r in markov_attribution(ev, "purchase", ["view", "click"]).collect()
    }
    assert got["view"]["p_conv"] == pytest.approx(0.5)
    assert got["view"]["removal_effect"] == pytest.approx(1.0)
    assert got["click"]["removal_effect"] == pytest.approx(0.0)
    assert got["view"]["credit"] == pytest.approx(1.0)
    assert got["click"]["credit"] == pytest.approx(0.0)


def test_markov_journey_segmentation_and_self_transitions(spark):
    # one user: view, view, purchase, click  ->  journey1 (view,view)
    # converted with a self-transition, journey2 (click) unconverted
    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "view"),
        (1, "2024-01-01 00:02:00", "purchase"),
        (1, "2024-01-01 00:03:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    journeys = _py_journeys(
        [(r[0], r[1], r[2]) for r in rows], "purchase", ["view", "click"]
    )
    assert journeys == [(("view", "view"), True), (("click",), False)]
    got = {
        r["channel"]: r
        for r in markov_attribution(ev, "purchase", ["view", "click"]).collect()
    }
    # chain: start->view 1, view->view 1 (self), view->conv 1,
    # start->click 1, click->null 1  => p_conv = 0.5
    assert got["view"]["p_conv"] == pytest.approx(0.5)
    assert got["view"]["removal_effect"] == pytest.approx(1.0)


def test_shapley_matches_python_replay_and_efficiency(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["channel"]: r["credit"]
        for r in shapley_attribution(ev, "purchase", TOUCHES).collect()
    }
    rows = [
        (r["user_id"], r["ts"], r["event_type"])
        for r in ev.select("user_id", "ts", "event_type").collect()
    ]
    journeys = _py_journeys(rows, "purchase", TOUCHES)
    coalitions = {}
    for path, converted in journeys:
        if converted:
            s = tuple(sorted(set(path)))
            coalitions[s] = coalitions.get(s, 0) + 1
    ref = py_shapley_credits(list(coalitions.items()))
    assert set(got) == set(ref)
    for c in ref:
        assert got[c] == pytest.approx(ref[c], rel=1e-9)
    # efficiency axiom: credits sum to conversions with >=1 touch
    attributable = sum(
        n for s, n in coalitions.items() if len(s) > 0
    )
    assert sum(got.values()) == pytest.approx(attributable, rel=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "shapley_attribution", len(rows), True, oracle="python-reference",
        value=sum(got.values()),
    )


def test_shapley_hand_case():
    # textbook: {A}: 2 conv, {B}: 1 conv, {A,B}: 1 conv
    # v(A)=2, v(B)=1, v(AB)=4
    # phi_A = .5*(v(A)-0) + .5*(v(AB)-v(B)) = .5*2 + .5*3 = 2.5
    # phi_B = .5*(v(B)-0) + .5*(v(AB)-v(A)) = .5*1 + .5*2 = 1.5
    credits = py_shapley_credits([(("A",), 2), (("B",), 1), (("A", "B"), 1)])
    assert credits["A"] == pytest.approx(2.5)
    assert credits["B"] == pytest.approx(1.5)
    assert credits["A"] + credits["B"] == pytest.approx(4.0)


def test_channel_cap_validation(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="max_channels"):
        markov_attribution(ev, "purchase", ["view"], max_channels=0)
    with pytest.raises(ValueError, match="max_channels"):
        shapley_attribution(ev, "purchase", ["view"], max_channels=0)

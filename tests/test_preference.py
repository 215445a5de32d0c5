"""Bradley–Terry preference fitting (operators/preference.py): exact
MM replay parity + planted-strength recovery laws."""

from __future__ import annotations

import math
import random

import pytest

from data_export_tool_spark.operators.preference import (
    bradley_terry,
    py_bradley_terry,
)


def _arena(seed=31, n_cmp=6000):
    """Synthetic arena: 6 models with true strengths 1..32 (×2 steps),
    pairs sampled uniformly, winners drawn from the BT law."""
    rng = random.Random(seed)
    items = [f"m{i}" for i in range(6)]
    true_p = {f"m{i}": 2.0**i for i in range(6)}
    rows = []
    for k in range(n_cmp):
        a, b = rng.sample(items, 2)
        p_a = true_p[a] / (true_p[a] + true_p[b])
        w = a if rng.random() < p_a else b
        rows.append((k, a, b, w))
    return rows, true_p


def test_bradley_terry_matches_python_replay(spark):
    rows, _ = _arena()
    # add junk rows the operator must drop: tie marker, NULL, self-pair
    junk = [
        (90001, "m0", "m1", "tie"),
        (90002, None, "m1", "m1"),
        (90003, "m2", "m2", "m2"),
    ]
    df = spark.createDataFrame(
        rows + junk, "cmp_id long, a string, b string, winner string"
    )
    got = {r["item"]: r for r in bradley_terry(df, "a", "b", "winner").collect()}
    # replay: identical pair-grain aggregation + MM in python
    pair_counts, wins = {}, {}
    for _, a, b, w in rows:
        lo, hi = min(a, b), max(a, b)
        n, w_lo = pair_counts.get((lo, hi), (0, 0))
        pair_counts[(lo, hi)] = (n + 1, w_lo + (1 if w == lo else 0))
        wins.setdefault(a, 0)
        wins.setdefault(b, 0)
        wins[w] += 1
    ref = py_bradley_terry(pair_counts, wins)
    assert set(got) == set(ref)
    for item, p_ref in ref.items():
        assert got[item]["strength"] == pytest.approx(p_ref, rel=1e-6)
        assert got[item]["log_strength"] == pytest.approx(
            math.log(p_ref), rel=1e-6, abs=1e-9
        )
        assert got[item]["wins"] == wins[item]
    # comparisons column: total appearances
    cmps = {i: 0 for i in wins}
    for (lo, hi), (n, _) in pair_counts.items():
        cmps[lo] += n
        cmps[hi] += n
    assert all(got[i]["comparisons"] == cmps[i] for i in cmps)
    from tests.conftest import record_opcheck

    record_opcheck(
        "bradley_terry", len(rows), True, oracle="python-reference",
        value=max(r["strength"] for r in got.values()),
    )


def test_bradley_terry_recovers_planted_ordering(spark):
    rows, true_p = _arena()
    df = spark.createDataFrame(
        rows, "cmp_id long, a string, b string, winner string"
    )
    got = bradley_terry(df, "a", "b", "winner").collect()
    # output is sorted strength-desc and recovers the planted ordering
    assert [r["item"] for r in got] == ["m5", "m4", "m3", "m2", "m1", "m0"]
    # pairwise win-probability implied by fitted strengths tracks the
    # planted 2:1 ratio between adjacent models (P = 2/3)
    s = {r["item"]: r["strength"] for r in got}
    for i in range(5):
        implied = s[f"m{i + 1}"] / (s[f"m{i + 1}"] + s[f"m{i}"])
        assert implied == pytest.approx(2.0 / 3.0, abs=0.06)
    # geometric-mean-1 normalization: log strengths sum to ~0
    assert sum(math.log(v) for v in s.values()) == pytest.approx(0.0, abs=1e-6)


def test_bradley_terry_distributed_path_agrees_with_driver_path(spark):
    # max_driver_pairs=0 forces the per-round join/agg loop; identical
    # arithmetic -> same strengths to float-reduction tolerance
    rows, _ = _arena(seed=37, n_cmp=800)
    df = spark.createDataFrame(
        rows, "cmp_id long, a string, b string, winner string"
    )
    fast = {
        r["item"]: r
        for r in bradley_terry(df, "a", "b", "winner", iters=12).collect()
    }
    dist = {
        r["item"]: r
        for r in bradley_terry(
            df, "a", "b", "winner", iters=12, max_driver_pairs=0
        ).collect()
    }
    assert set(fast) == set(dist)
    for item in fast:
        assert dist[item]["strength"] == pytest.approx(
            fast[item]["strength"], rel=1e-6
        )
        assert dist[item]["wins"] == fast[item]["wins"]
        assert dist[item]["comparisons"] == fast[item]["comparisons"]
    from tests.conftest import record_opcheck

    record_opcheck(
        "bradley_terry_distributed", len(fast), True,
        oracle="driver-path-twin",
    )


def test_bradley_terry_empty_raises(spark):
    df = spark.createDataFrame(
        [(1, "a", "a", "a")], "cmp_id long, a string, b string, winner string"
    )
    with pytest.raises(ValueError, match="no usable comparisons"):
        bradley_terry(df, "a", "b", "winner")


def test_bradley_terry_never_winner_floors(spark):
    df = spark.createDataFrame(
        [(1, "a", "z", "a"), (2, "b", "z", "b"), (3, "a", "b", "a")],
        "cmp_id long, a string, b string, winner string",
    )
    got = {r["item"]: r for r in bradley_terry(df, "a", "b", "winner").collect()}
    assert got["z"]["wins"] == 0
    assert got["z"]["strength"] == pytest.approx(1e-12)
    assert got["a"]["strength"] > got["b"]["strength"] > got["z"]["strength"]


def test_bradley_terry_uniform_wins_equal_strengths(spark):
    # every pair split 1-1 -> all strengths exactly 1 after round 1
    rows = []
    k = 0
    for a in ["x", "y", "z"]:
        for b in ["x", "y", "z"]:
            if a < b:
                rows += [(k, a, b, a), (k + 1, a, b, b)]
                k += 2
    df = spark.createDataFrame(
        rows, "cmp_id long, a string, b string, winner string"
    )
    got = bradley_terry(df, "a", "b", "winner").collect()
    assert all(r["strength"] == pytest.approx(1.0, rel=1e-9) for r in got)

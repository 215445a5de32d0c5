"""Weighted quantiles (operators/sketch.py weighted_quantiles):
python replay on weighted lineitem groups, hand laws, exclusions."""

from __future__ import annotations

import pytest

from data_export_tool_spark.operators.sketch import weighted_quantiles


def _replay(pairs, probs):
    """Weighted lower quantile over (value, weight) pairs."""
    agg = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0.0) + w
    vals = sorted(agg)
    tot = sum(agg.values())
    out = {}
    for p in probs:
        cw = 0.0
        for v in vals:
            cw += agg[v]
            if cw >= p * tot - 1e-12:
                out[p] = v
                break
    return out


def test_weighted_quantiles_hand_case(spark):
    # one heavy value dominates the median
    rows = [("g", 1.0, 1.0), ("g", 2.0, 10.0), ("g", 3.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {
        r["prob"]: r["value"]
        for r in weighted_quantiles(
            df, "v", "w", [0.05, 0.5, 1.0], by=["g"]
        ).collect()
    }
    assert got == {0.05: 1.0, 0.5: 2.0, 1.0: 3.0}
    # unweighted degenerate: equal weights == plain lower quantile
    eq = spark.createDataFrame(
        [("g", float(i), 1.0) for i in range(1, 11)],
        "g string, v double, w double",
    )
    got2 = {
        r["prob"]: r["value"]
        for r in weighted_quantiles(eq, "v", "w", [0.3, 0.9],
                                    by=["g"]).collect()
    }
    assert got2 == {0.3: 3.0, 0.9: 9.0}


def test_weighted_quantiles_exclusions_and_validation(spark):
    rows = [("g", 1.0, 1.0), ("g", None, 5.0), ("g", 9.0, 0.0),
            ("g", 9.0, None), ("g", 2.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {
        r["prob"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", [1.0], by=["g"]).collect()
    }
    # NULL value, zero and NULL weights carry no mass: max is 2
    assert got == {1.0: 2.0}
    with pytest.raises(ValueError, match="probabilities"):
        weighted_quantiles(df, "v", "w", [0.0])
    with pytest.raises(ValueError, match="probabilities"):
        weighted_quantiles(df, "v", "w", [])


def test_weighted_quantiles_replay_oracle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    probs = [0.1, 0.25, 0.5, 0.75, 0.95]
    got = {
        (r["l_returnflag"], r["prob"]): r["value"]
        for r in weighted_quantiles(
            li, "l_extendedprice", "l_quantity", probs,
            by=["l_returnflag"],
        ).collect()
    }
    rows = li.select("l_returnflag", "l_extendedprice",
                     "l_quantity").collect()
    groups: dict = {}
    for r in rows:
        if r["l_extendedprice"] is None or not r["l_quantity"]:
            continue
        groups.setdefault(r["l_returnflag"], []).append(
            (float(r["l_extendedprice"]), float(r["l_quantity"]))
        )
    want = {
        (g, p): v
        for g, pairs in groups.items()
        for p, v in _replay(pairs, probs).items()
    }
    assert got == want
    from tests.conftest import record_opcheck

    record_opcheck(
        "weighted_quantiles", len(want), True,
        oracle="python-reference",
    )


def test_weighted_quantiles_global_range_split_matches_grouped(spark):
    """The by=() range-split path must agree with the single-group
    grouped path (which uses the plain partitioned window)."""
    import random

    from data_export_tool_spark.operators.sketch import weighted_quantiles

    rnd = random.Random(7)
    rows = [
        (rnd.randint(0, 500) / 10.0, rnd.randint(1, 9) * 1.0, 1)
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "v double, w double, g int")
    probs = [0.1, 0.5, 0.9, 1.0]
    glob = {
        r["prob"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", probs).collect()
    }
    grp = {
        r["prob"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", probs, by=["g"]).collect()
    }
    assert glob == grp

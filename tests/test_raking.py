"""IPF survey raking (operators/raking.py): exact replay parity and
the margins-are-met law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.raking import py_ipf, rake_weights


def test_rake_matches_python_replay_and_hits_margins(spark, sf_dir):
    # skewed sample from the lake: nation buckets x segment-ish flag
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        (F.col("c_nationkey") % 3).cast("int").alias("region3"),
        (F.col("c_acctbal") > 0).alias("positive"),
    )
    margins = {
        "region3": {0: 0.5, 1: 0.3, 2: 0.2},
        "positive": {True: 0.6, False: 0.4},
    }
    out = rake_weights(cust, margins)
    rows = [(r["region3"], r["positive"], r["rake_weight"]) for r in out.collect()]
    n = len(rows)
    # 1) weighted margins hit the targets
    for dim, (col_idx, tgt) in enumerate(
        [(0, margins["region3"]), (1, margins["positive"])]
    ):
        for v, share in tgt.items():
            got = sum(w for *vals, w in rows if vals[col_idx] == v) / sum(
                w for *_, w in rows
            )
            assert got == pytest.approx(share, abs=1e-7), (dim, v)
    # 2) weighted total == raw total (mean-1 normalization)
    assert sum(w for *_, w in rows) == pytest.approx(n, rel=1e-9)
    # 3) exact replay: same cells -> same per-cell weights
    cell_counts = {}
    for r3, pos, _ in rows:
        cell_counts[(r3, pos)] = cell_counts.get((r3, pos), 0) + 1
    cells = sorted(cell_counts.items())
    ref_w, _, dev = py_ipf(
        cells,
        [
            {k: v / sum(margins["region3"].values()) for k, v in margins["region3"].items()},
            {k: v / sum(margins["positive"].values()) for k, v in margins["positive"].items()},
        ],
    )
    ref = {cell: w for (cell, _), w in zip(cells, ref_w)}
    for r3, pos, w in rows:
        assert w == pytest.approx(ref[(r3, pos)], rel=1e-9)
    assert dev < 1e-8
    from tests.conftest import record_opcheck

    record_opcheck(
        "rake_weights", n, True, oracle="python-reference", value=dev
    )


def test_rake_single_margin_is_exact_poststratification(spark):
    # one margin -> IPF == classic post-stratification in one sweep
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2, "g string"
    )
    out = rake_weights(df, {"g": {"a": 0.5, "b": 0.5}})
    w = {r["g"]: r["rake_weight"] for r in out.collect()}
    # a: 8 rows carry 5 units -> 0.625 each; b: 2 rows carry 5 -> 2.5
    assert w["a"] == pytest.approx(0.625)
    assert w["b"] == pytest.approx(2.5)


def test_rake_null_category_and_validation(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), (None,), (None,)], "g string"
    )
    out = rake_weights(df, {"g": {"x": 0.75, None: 0.25}})
    w = {r["g"]: r["rake_weight"] for r in out.collect()}
    assert w["x"] == pytest.approx(1.5)
    assert w[None] == pytest.approx(0.5)
    # unknown sample category
    with pytest.raises(ValueError, match="no margin target"):
        rake_weights(df, {"g": {"x": 1.0}})
    # target mass on an absent category
    with pytest.raises(ValueError, match="zero sample mass"):
        rake_weights(
            df.where("g IS NOT NULL"), {"g": {"x": 0.5, "y": 0.5}}
        )
    with pytest.raises(ValueError, match="at least one"):
        rake_weights(df, {})
    with pytest.raises(ValueError, match="negative"):
        rake_weights(df, {"g": {"x": -1.0, None: 2.0}})

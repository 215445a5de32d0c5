"""Uplift evaluation (operators/uplift.py): exact bucket-fold replay +
the good-score-beats-random / anti-score-loses laws."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.uplift import (
    py_qini_fold,
    qini_curve,
    uplift_metrics,
)


def _py_buckets(rows, n_bins):
    """Replay of the bucketing: percent_rank of −score at value grain
    (ties share the min rank → same bucket), then bucket-grain sums."""
    neg = sorted({-s for _, _, s in rows})
    # SQL rank of value v among all ROWS (ties share min rank)
    from collections import Counter

    counts = Counter(-s for _, _, s in rows)
    rank = {}
    run = 0
    for v in neg:
        rank[v] = run + 1
        run += counts[v]
    n = len(rows)
    buckets = {}
    for t, y, s in rows:
        pr = (rank[-s] - 1) / (n - 1) if n > 1 else 0.0
        b = min(int(pr * n_bins) + 1, n_bins)
        cur = buckets.setdefault(b, [0, 0, 0.0, 0.0])
        if t == 1:
            cur[0] += 1
            cur[2] += y
        else:
            cur[1] += 1
            cur[3] += y
    return [(b, *v) for b, v in sorted(buckets.items())]


def _heterogeneous(seed=41, n=12000):
    """Half the population responds to treatment (+0.3 conversion),
    half doesn't; score = true segment uplift + noise."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        responsive = i % 2 == 0
        t = 1 if rng.random() < 0.5 else 0
        p = 0.1 + (0.3 if (responsive and t == 1) else 0.0)
        y = 1.0 if rng.random() < p else 0.0
        score = (0.3 if responsive else 0.0) + rng.gauss(0.0, 0.05)
        rows.append((t, y, score))
    return rows


def test_qini_curve_matches_python_replay(spark):
    rows = _heterogeneous()
    df = spark.createDataFrame(rows, "t int, y double, score double")
    got = qini_curve(df, "t", "y", "score", n_bins=20).collect()
    ref = py_qini_fold(_py_buckets(rows, 20))
    assert len(got) == len(ref["curve"])
    for g, r in zip(sorted(got, key=lambda x: x["bucket"]), ref["curve"]):
        assert g["bucket"] == r[0]
        assert g["frac"] == pytest.approx(r[1], rel=1e-9)
        assert (g["n_t"], g["n_c"]) == (r[2], r[3])
        assert g["qini"] == pytest.approx(r[6], rel=1e-9)
        assert g["qini_random"] == pytest.approx(r[7], rel=1e-9)
        assert g["uplift_abs"] == pytest.approx(r[8], rel=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "qini_curve", len(rows), True, oracle="python-reference",
        value=ref["qini_area"],
    )


def test_uplift_metrics_good_score_beats_random_anti_score_loses(spark):
    rows = _heterogeneous()
    df = spark.createDataFrame(rows, "t int, y double, score double")
    good = uplift_metrics(df, "t", "y", "score", n_bins=20).first()
    anti = uplift_metrics(
        df.withColumn("anti", -F.col("score")), "t", "y", "anti", n_bins=20
    ).first()
    # the true ATE is ~0.15 (half the population gets +0.3)
    assert good["ate"] == pytest.approx(0.15, abs=0.03)
    assert anti["ate"] == pytest.approx(good["ate"], rel=1e-9)  # order-free
    # a score aligned with true uplift beats random targeting...
    assert good["qini_area"] > 100.0
    # ...and the reversed ordering is symmetrically worse than random
    assert anti["qini_area"] < -100.0
    assert anti["qini_area"] == pytest.approx(-good["qini_area"], rel=0.05)
    # AUUC endpoint sanity: uplift_abs at frac=1 equals ate*n for both
    assert good["auuc"] > anti["auuc"]
    from tests.conftest import record_opcheck

    record_opcheck(
        "uplift_metrics",
        int(good["n"]),
        True,
        oracle="planted-truth",
        value=good["qini_area"],
        floor=100.0,
    )


def test_qini_handles_ties_and_nulls(spark):
    # constant score -> one bucket; NULLs dropped; single-arm -> NULL areas
    rows = [(1, 1.0, 0.5), (0, 0.0, 0.5), (1, 0.0, 0.5), (None, 1.0, 0.5),
            (1, None, 0.5), (0, 1.0, None)]
    df = spark.createDataFrame(rows, "t int, y double, score double")
    curve = qini_curve(df, "t", "y", "score", n_bins=10).collect()
    assert len(curve) == 1
    assert curve[0]["n_t"] == 2 and curve[0]["n_c"] == 1
    assert curve[0]["frac"] == pytest.approx(1.0)
    # treated-only data: qini undefined -> NULL metrics, not a crash
    only_t = spark.createDataFrame(
        [(1, 1.0, 0.9), (1, 0.0, 0.1)], "t int, y double, score double"
    )
    m = uplift_metrics(only_t, "t", "y", "score", n_bins=5).first()
    assert m["qini_area"] is None and m["ate"] is None
    with pytest.raises(ValueError, match="n_bins"):
        qini_curve(df, "t", "y", "score", n_bins=1)

"""Classifier evaluation vs an exact tie-averaged Mann-Whitney python
oracle: lossless on grid-aligned scores, bounded error on continuous
scores, constant-score tie law, exclusion accounting, and a full
threshold-sweep confusion replay."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.evalmetrics import (
    binary_metrics,
    threshold_table,
)

# power-of-two grid: k/256 and k/256*256 are exact in binary floating
# point, so grid-aligned really means lossless (k/200 would float-drift
# across bin edges under floor)
BINS = 256


def _exact_auc(y, s):
    """Tie-averaged Mann-Whitney AUC, O(n log n) python reference."""
    order = np.lexsort((np.arange(len(s)), s))
    s, y = np.asarray(s)[order], np.asarray(y)[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0  # average 1-based rank
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


@pytest.fixture(scope="module")
def scored(spark):
    rng = np.random.RandomState(7)
    n = 4000
    y = (rng.rand(n) < 0.4).astype(int)
    # informative but noisy scores, then snapped to the k/BINS grid so
    # binning at BINS is lossless
    s = np.clip(0.5 * y + 0.35 * rng.rand(n) + 0.15 * rng.rand(n), 0, 0.999)
    s = np.round(s * BINS) / BINS
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, p double"
    )
    return df, y, s


def test_auc_exact_on_grid_aligned_scores(spark, scored):
    df, y, s = scored
    rep = binary_metrics(df, "y", "p", bins=BINS).collect()[0]
    want = _exact_auc(y, s)
    ok = (
        abs(rep["auc"] - want) < 1e-12
        and rep["n_pos"] == int(y.sum())
        and rep["n_neg"] == int((1 - y).sum())
        and rep["n_excluded"] == 0
        and abs(rep["base_rate"] - y.mean()) < 1e-12
        and abs(
            rep["accuracy_at_half"] - float(((s >= 0.5) == y).mean())
        ) < 1e-12
    )
    record_opcheck(
        "binary_metrics_auc", len(y), bool(ok),
        oracle="python-reference", value=float(rep["auc"]),
    )
    assert ok


def test_auc_binned_close_on_continuous_scores(spark):
    rng = np.random.RandomState(11)
    n = 3000
    y = (rng.rand(n) < 0.5).astype(int)
    s = np.clip(0.4 * y + 0.6 * rng.rand(n), 0, 1.0)  # continuous
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, p double"
    )
    got = binary_metrics(df, "y", "p", bins=1000).collect()[0]["auc"]
    assert abs(got - _exact_auc(y, s)) < 0.005  # resolution-bounded


def test_tie_and_exclusion_laws(spark):
    df = spark.createDataFrame(
        [
            (1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5),  # all tied
            (2, 0.9),        # non-binary label: excluded
            (1, None),       # NULL score: excluded
            (0, 1.5),        # out-of-range: excluded
            (None, 0.2),     # NULL label: excluded
        ],
        "y int, p double",
    )
    rep = binary_metrics(df, "y", "p", bins=10).collect()[0]
    assert rep["auc"] == 0.5  # constant score = coin flip
    assert rep["n_pos"] == 2 and rep["n_neg"] == 2
    assert rep["n_excluded"] == 4

    one_class = spark.createDataFrame([(1, 0.3), (1, 0.9)], "y int, p double")
    assert np.isnan(binary_metrics(one_class).collect()[0]["auc"])

    with pytest.raises(ValueError):
        binary_metrics(df, "y", "p", bins=0)


def test_threshold_table_replays_confusions(spark, scored):
    df, y, s = scored
    got = threshold_table(df, "y", "p", bins=BINS).collect()
    assert len(got) == len(np.unique(np.floor(np.minimum(s * BINS, BINS - 1))))
    ok = True
    prev_recall = -1.0
    for r in got:
        t = r["threshold"]
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        ok = ok and r["tp"] == tp and r["fp"] == fp
        ok = ok and r["fn"] == int(y.sum()) - tp
        ok = ok and abs(r["precision"] - tp / (tp + fp)) < 1e-12
        ok = ok and abs(r["recall"] - tp / y.sum()) < 1e-12
        ok = ok and r["recall"] >= prev_recall  # descending thresholds
        prev_recall = r["recall"]
    record_opcheck(
        "threshold_table", len(got), bool(ok), oracle="python-reference"
    )
    assert ok

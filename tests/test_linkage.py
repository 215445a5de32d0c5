"""Fellegi–Sunter EM record linkage (operators/linkage.py): exact
python-replay parity + unsupervised separation of planted duplicates."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.linkage import fs_em, fs_score, py_fs_em


def _planted_pairs(seed=29, n_match=400, n_non=4000):
    """Candidate pairs: true matches agree on most fields, non-matches
    agree rarely (per-field true m/u below)."""
    rng = random.Random(seed)
    m_true = [0.95, 0.90, 0.80]
    u_true = [0.02, 0.10, 0.30]
    rows = []
    for idx in range(n_match + n_non):
        is_match = idx < n_match
        p = m_true if is_match else u_true
        rows.append(
            (
                idx,
                int(is_match),
                int(rng.random() < p[0]),
                int(rng.random() < p[1]),
                int(rng.random() < p[2]),
            )
        )
    rng.shuffle(rows)
    return rows


def test_fs_em_matches_python_replay(spark):
    rows = _planted_pairs()
    df = spark.createDataFrame(
        rows, "pair_id long, truth int, g_name int, g_dob int, g_city int"
    )
    model = fs_em(df, ["g_name", "g_dob", "g_city"])
    # replay: aggregate patterns in python, run the same EM
    counts = {}
    for _, _, a, b, c in rows:
        counts[(a, b, c)] = counts.get((a, b, c), 0) + 1
    ref = py_fs_em(sorted(counts.items()), 3)
    assert model["lambda"] == pytest.approx(ref["lambda"], rel=1e-9)
    for i, f in enumerate(model["fields"]):
        assert f["m"] == pytest.approx(ref["m"][i], rel=1e-9)
        assert f["u"] == pytest.approx(ref["u"][i], rel=1e-9)
        assert f["weight_agree"] == pytest.approx(
            math.log2(ref["m"][i] / ref["u"][i]), rel=1e-9
        )
    assert model["n_pairs"] == len(rows)
    assert model["loglik"] == pytest.approx(ref["loglik"], rel=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "fs_em", len(rows), True, oracle="python-reference",
        value=model["lambda"],
    )


def test_fs_em_recovers_planted_parameters_and_separates(spark):
    rows = _planted_pairs()
    df = spark.createDataFrame(
        rows, "pair_id long, truth int, g_name int, g_dob int, g_city int"
    )
    model = fs_em(df, ["g_name", "g_dob", "g_city"])
    # prevalence 400/4400 ≈ 0.0909 recovered without labels
    assert model["lambda"] == pytest.approx(400 / 4400, abs=0.03)
    m_true, u_true = [0.95, 0.90, 0.80], [0.02, 0.10, 0.30]
    for f, mt, ut in zip(model["fields"], m_true, u_true):
        assert f["m"] == pytest.approx(mt, abs=0.06)
        assert f["u"] == pytest.approx(ut, abs=0.04)
        assert f["weight_agree"] > 0 > f["weight_disagree"]
    scored = fs_score(df, model)
    # separation: posterior ranks matches above non-matches (AUC-ish:
    # mean posterior of matches far above that of non-matches, and a
    # 0.5 cut classifies well despite no labels in training)
    agg = scored.groupBy("truth").agg(
        F.avg("match_probability").alias("avg_p"),
        F.sum((F.col("match_probability") > 0.5).cast("int")).alias("above"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    stats = {r["truth"]: r for r in agg}
    assert stats[1]["avg_p"] > 0.85
    assert stats[0]["avg_p"] < 0.10
    assert stats[1]["above"] / stats[1]["n"] > 0.85  # match recall @0.5
    assert stats[0]["above"] / stats[0]["n"] < 0.05  # false-match rate
    from tests.conftest import record_opcheck

    record_opcheck(
        "fs_score_separation",
        len(rows),
        True,
        oracle="planted-truth",
        value=stats[1]["avg_p"] - stats[0]["avg_p"],
        floor=0.75,
    )


def test_fs_score_is_exact_column_algebra(spark):
    # hand-checkable model: weights sum exactly, posterior from log-odds
    model = {
        "lambda": 0.2,
        "prior_log_odds": math.log2(0.2 / 0.8),
        "fields": [
            {"col": "a", "m": 0.9, "u": 0.1,
             "weight_agree": math.log2(9.0),
             "weight_disagree": math.log2(0.1 / 0.9)},
            {"col": "b", "m": 0.8, "u": 0.4,
             "weight_agree": math.log2(2.0),
             "weight_disagree": math.log2(0.2 / 0.6)},
        ],
    }
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (0, None)], "a int, b int"
    )
    got = {
        (r["a"], r["b"]): (r["match_weight"], r["match_probability"])
        for r in fs_score(df, model).collect()
    }
    for (a, b), (w, p) in got.items():
        fa = model["fields"][0]
        fb = model["fields"][1]
        exp_w = (fa["weight_agree"] if a == 1 else fa["weight_disagree"]) + (
            fb["weight_agree"] if b == 1 else fb["weight_disagree"]
        )
        assert w == pytest.approx(exp_w, rel=1e-12)
        lo = model["prior_log_odds"] + exp_w
        assert p == pytest.approx(1.0 / (1.0 + 2.0 ** -lo), rel=1e-12)
    # NULL agreement counted as disagreement (the b=None row)
    assert got[(0, None)][0] == pytest.approx(
        model["fields"][0]["weight_disagree"]
        + model["fields"][1]["weight_disagree"],
        rel=1e-12,
    )


def test_fs_em_validation(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="at least one"):
        fs_em(df, [])
    with pytest.raises(ValueError, match="k <= 20"):
        fs_em(df, [f"c{i}" for i in range(21)])
    with pytest.raises(ValueError, match="no candidate pairs"):
        fs_em(df.where("a > 1"), ["a"])

"""Observational causal estimators (operators/causal.py) vs exact
python replays + planted-effect recovery laws."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from data_export_tool_spark.operators.causal import (
    did_estimate,
    ipw_ate,
    parallel_trends_check,
)


def _welch_cells(rows):
    """(n, mean, var_samp) per key from [(key, value)] — the python
    replay of causal._cell_stats."""
    out = {}
    for key in {k for k, _ in rows}:
        vals = [v for k, v in rows if k == key and v is not None]
        n = len(vals)
        m = sum(vals) / n if n else None
        v = (
            sum((x - m) ** 2 for x in vals) / (n - 1)
            if n >= 2
            else None
        )
        out[key] = (n, m, v)
    return out


def test_did_matches_python_replay(spark, sf_dir):
    # real lake data: purchase amounts, arms from user parity, periods
    # from event-time month parity — whatever cells result, the replay
    # must agree bit-for-bit
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "purchase")
        .select(
            F.when(F.col("user_id") % 2 == 0, "T").otherwise("C").alias("arm"),
            F.when(F.dayofmonth("ts") % 2 == 0, "post").otherwise("pre").alias("per"),
            F.col("value").cast("double").alias("y"),
        )
    )
    got = did_estimate(ev, "arm", "per", "y", "T", "C", "pre", "post").first()
    rows = [((r["arm"], r["per"]), r["y"]) for r in ev.collect()]
    cells = _welch_cells(rows)
    n_tp, m_tp, v_tp = cells[("T", "pre")]
    n_tq, m_tq, v_tq = cells[("T", "post")]
    n_cp, m_cp, v_cp = cells[("C", "pre")]
    n_cq, m_cq, v_cq = cells[("C", "post")]
    did = (m_tq - m_tp) - (m_cq - m_cp)
    se = math.sqrt(v_tp / n_tp + v_tq / n_tq + v_cp / n_cp + v_cq / n_cq)
    z = did / se
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert (got["n_t_pre"], got["n_t_post"]) == (n_tp, n_tq)
    assert (got["n_c_pre"], got["n_c_post"]) == (n_cp, n_cq)
    assert got["mean_t_post"] == pytest.approx(m_tq, rel=1e-12)
    assert got["did"] == pytest.approx(did, rel=1e-9)
    assert got["se"] == pytest.approx(se, rel=1e-9)
    assert got["z"] == pytest.approx(z, rel=1e-9)
    assert got["p_value"] == pytest.approx(p, rel=1e-6, abs=1e-12)
    from tests.conftest import record_opcheck

    record_opcheck(
        "did_estimate", len(rows), True, oracle="python-reference",
        value=got["did"],
    )


def test_did_recovers_planted_effect_and_trends_check_passes(spark):
    # parallel-trend arms, effect +5 on treated in post only
    rng = random.Random(11)
    rows = []
    for i in range(4000):
        arm = "T" if i % 2 == 0 else "C"
        base = 10.0 + (3.0 if arm == "T" else 0.0)  # level difference OK
        for per_i, per in enumerate(["p0", "p1", "pre", "post"]):
            y = base + 2.0 * per_i + rng.gauss(0.0, 1.0)
            if arm == "T" and per == "post":
                y += 5.0
            rows.append((arm, per, y))
    df = spark.createDataFrame(rows, "arm string, per string, y double")
    got = did_estimate(df, "arm", "per", "y", "T", "C", "pre", "post").first()
    assert got["did"] == pytest.approx(5.0, abs=0.15)
    assert got["significant"] is True
    # naive post-only comparison is biased by the level difference
    naive = got["mean_t_post"] - got["mean_c_post"]
    assert abs(naive - 5.0) > 1.0
    trends = parallel_trends_check(
        df, "arm", "per", "y", "T", "C", ["p0", "p1", "pre"]
    ).collect()
    assert len(trends) == 2
    assert all(t["significant"] is False for t in trends)
    assert all(abs(t["did"]) < 0.2 for t in trends)


def test_parallel_trends_check_catches_differential_trend(spark):
    rng = random.Random(13)
    rows = []
    for i in range(3000):
        arm = "T" if i % 2 == 0 else "C"
        slope = 3.0 if arm == "T" else 1.0  # treated trending faster pre-treatment
        for per_i, per in enumerate(["p0", "p1", "pre"]):
            rows.append((arm, per, slope * per_i + rng.gauss(0.0, 1.0)))
    df = spark.createDataFrame(rows, "arm string, per string, y double")
    trends = parallel_trends_check(
        df, "arm", "per", "y", "T", "C", ["p0", "p1", "pre"]
    ).collect()
    assert all(t["significant"] is True for t in trends)
    assert all(t["did"] == pytest.approx(2.0, abs=0.25) for t in trends)
    with pytest.raises(ValueError, match="pre_periods"):
        parallel_trends_check(df, "arm", "per", "y", "T", "C", ["p0"])


def _py_hajek_ipw(rows, trim):
    """Exact replay of the ipw_ate estimator arithmetic from
    (t, y, e_raw) triples — the oracle for the OPCHECK row."""
    lo, hi = trim, 1.0 - trim
    n_trim = sum(1 for _, _, e in rows if e < lo or e > hi)
    sy1 = sw1 = sw1sq = syy1 = 0.0
    sy0 = sw0 = sw0sq = syy0 = 0.0
    for t, y, e_raw in rows:
        e = min(max(e_raw, lo), hi)
        if t == 1:
            w = 1.0 / e
            sy1 += w * y
            sw1 += w
            sw1sq += w * w
            syy1 += w * y * y
        else:
            w = 1.0 / (1.0 - e)
            sy0 += w * y
            sw0 += w
            sw0sq += w * w
            syy0 += w * y * y
    mean_t, mean_c = sy1 / sw1, sy0 / sw0
    ate = mean_t - mean_c
    se2 = 0.0
    for sy, sw, swsq, syy, m in (
        (sy1, sw1, sw1sq, syy1, mean_t),
        (sy0, sw0, sw0sq, syy0, mean_c),
    ):
        ess = sw * sw / swsq
        wvar = max((syy - 2.0 * m * sy + m * m * sw) / sw, 0.0)
        se2 += wvar / ess
    return ate, math.sqrt(se2), n_trim, sw1 * sw1 / sw1sq, sw0 * sw0 / sw0sq


def test_ipw_matches_python_replay(spark, sf_dir):
    # propensity derived from a real column so it varies per row
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 3 == 0).cast("int").alias("t"),
            F.col("value").cast("double").alias("y"),
            (F.lit(0.2) + F.lit(0.6) * (F.col("user_id") % 10) / 9.0).alias("e"),
        )
    )
    got = ipw_ate(ev, "t", "y", propensity_col="e", trim=0.25).first()
    rows = [(r["t"], r["y"], r["e"]) for r in ev.collect()]
    ate, se, n_trim, ess_t, ess_c = _py_hajek_ipw(rows, 0.25)
    assert got["estimator"] == "ipw"
    assert got["n"] == len(rows)
    assert got["n_treated"] == sum(t for t, _, _ in rows)
    assert got["ate"] == pytest.approx(ate, rel=1e-9)
    assert got["se"] == pytest.approx(se, rel=1e-9)
    assert got["n_trimmed"] == n_trim
    assert got["ess_treated"] == pytest.approx(ess_t, rel=1e-9)
    assert got["ess_control"] == pytest.approx(ess_c, rel=1e-9)
    from tests.conftest import record_opcheck

    record_opcheck(
        "ipw_ate", len(rows), True, oracle="python-reference", value=got["ate"]
    )


def test_ipw_corrects_confounding_where_naive_diff_is_biased(spark):
    # confounder x drives BOTH treatment (p = 0.2 + 0.6x) and outcome
    # (y = 10x + noise); the true effect is exactly +2
    rng = random.Random(17)
    rows = []
    for _ in range(20000):
        x = rng.random()
        e = 0.2 + 0.6 * x
        t = 1 if rng.random() < e else 0
        y = 10.0 * x + 2.0 * t + rng.gauss(0.0, 0.5)
        rows.append((t, y, e))
    df = spark.createDataFrame(rows, "t int, y double, e double")
    naive = df.groupBy().agg(
        F.avg(F.when(F.col("t") == 1, F.col("y"))).alias("mt"),
        F.avg(F.when(F.col("t") == 0, F.col("y"))).alias("mc"),
    ).first()
    naive_diff = naive["mt"] - naive["mc"]
    assert naive_diff > 3.0  # confounding inflates the effect
    got = ipw_ate(df, "t", "y", propensity_col="e", trim=0.01).first()
    assert got["ate"] == pytest.approx(2.0, abs=0.25)
    assert got["significant"] is True


def test_aipw_doubly_robust_replay_and_effect(spark):
    # outcome models supplied: m1 = 10x + 2, m0 = 10x (the truth);
    # AIPW must (a) equal the python replay exactly, (b) land on +2
    rng = random.Random(19)
    rows = []
    for _ in range(8000):
        x = rng.random()
        e = 0.2 + 0.6 * x
        t = 1 if rng.random() < e else 0
        y = 10.0 * x + 2.0 * t + rng.gauss(0.0, 0.5)
        rows.append((t, y, e, 10.0 * x + 2.0, 10.0 * x))
    df = spark.createDataFrame(rows, "t int, y double, e double, m1 double, m0 double")
    got = ipw_ate(
        df, "t", "y", propensity_col="e", mu1_col="m1", mu0_col="m0", trim=0.01
    ).first()
    phis = []
    for t, y, e_raw, m1, m0 in rows:
        e = min(max(e_raw, 0.01), 0.99)
        phis.append(m1 - m0 + t * (y - m1) / e - (1 - t) * (y - m0) / (1 - e))
    n = len(phis)
    ate = sum(phis) / n
    var = sum((p - ate) ** 2 for p in phis) / (n - 1)
    assert got["estimator"] == "aipw"
    assert got["ate"] == pytest.approx(ate, rel=1e-9)
    assert got["se"] == pytest.approx(math.sqrt(var / n), rel=1e-9)
    assert got["ate"] == pytest.approx(2.0, abs=0.1)
    from tests.conftest import record_opcheck

    record_opcheck(
        "aipw_ate", n, True, oracle="python-reference", value=got["ate"]
    )


def test_ipw_internal_propensity_fit_path(spark):
    # vec_col path: the fitted-propensity scoring must stay a column
    # projection and yield an estimate near the truth
    rng = random.Random(23)
    rows = []
    for _ in range(6000):
        x = rng.random()
        e = 1.0 / (1.0 + math.exp(-(2.0 * x - 1.0)))
        t = 1 if rng.random() < e else 0
        y = 4.0 * x + 1.5 * t + rng.gauss(0.0, 0.5)
        rows.append((t, y, [x]))
    df = spark.createDataFrame(rows, "t int, y double, fx array<double>")
    got = ipw_ate(df, "t", "y", vec_col="fx", trim=0.01).first()
    assert got["ate"] == pytest.approx(1.5, abs=0.25)


def test_ipw_validation(spark):
    df = spark.createDataFrame([(1, 1.0, 0.5)], "t int, y double, e double")
    with pytest.raises(ValueError, match="trim"):
        ipw_ate(df, "t", "y", propensity_col="e", trim=0.7)
    with pytest.raises(ValueError, match="propensity_col or vec_col"):
        ipw_ate(df, "t", "y")

"""A/B readout (operators/experiment.py) against a full Python replay
of the sufficient statistics + Welch arithmetic, with an engineered
true-effect / no-effect pair and NULL/small-sample edges."""

from __future__ import annotations

import math
import statistics

from tests.conftest import record_opcheck
from data_export_tool_spark.operators.experiment import ab_test, py_welch


def _mk(spark):
    rows = []
    for i in range(4000):
        g = "control" if i % 2 == 0 else "treatment"
        u = ((i * 2654435761) % 10_000) / 10_000.0  # deterministic noise
        shifted = u + (0.08 if g == "treatment" else 0.0)  # true effect
        flat = u  # no effect
        rows.append(
            (g, round(shifted, 9), round(flat, 9), None if i % 10 == 0 else u)
        )
    return rows, spark.createDataFrame(
        rows, "grp string, m_shift double, m_flat double, m_nulls double"
    )


def test_ab_test_matches_python_replay(spark):
    rows, df = _mk(spark)
    got = {
        r["metric"]: r
        for r in ab_test(
            df, "grp", ["m_shift", "m_flat", "m_nulls"], "control", "treatment"
        ).collect()
    }
    ok = True
    for mi, m in enumerate(["m_shift", "m_flat", "m_nulls"]):
        a = [r[1 + mi] for r in rows if r[0] == "control" and r[1 + mi] is not None]
        b = [r[1 + mi] for r in rows if r[0] == "treatment" and r[1 + mi] is not None]
        t, p = py_welch(
            len(a), statistics.fmean(a), statistics.variance(a),
            len(b), statistics.fmean(b), statistics.variance(b),
        )
        r = got[m]
        ok = ok and r["n_a"] == len(a) and r["n_b"] == len(b)
        ok = ok and abs(r["mean_a"] - statistics.fmean(a)) < 1e-9
        ok = ok and abs(r["t_stat"] - t) < 1e-6 and abs(r["p_value"] - p) < 1e-9
    # engineered outcomes
    assert got["m_shift"]["significant"] is True
    assert got["m_flat"]["significant"] is False
    assert abs(got["m_flat"]["t_stat"]) < 2.0
    assert got["m_shift"]["lift"] > 0.1
    record_opcheck(
        "ab_test", len(got), ok, oracle="python-reference",
        value=round(got["m_shift"]["p_value"], 9),
    )
    assert ok


def test_ab_test_edges(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0)], "grp string, m double"
    )
    r = ab_test(df, "grp", "m", "a", "b").collect()[0]
    # n_b < 2: no test, but counts/means still reported
    assert r["n_a"] == 2 and r["n_b"] == 1
    assert r["t_stat"] is None and r["significant"] is None
    assert abs(r["lift"] - 1.0) < 1e-12
    # zero-variance arms: se2 == 0 -> no statistic rather than a crash
    z = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], "grp string, m double"
    )
    rz = ab_test(z, "grp", "m", "a", "b").collect()[0]
    assert rz["t_stat"] is None and rz["p_value"] is None
    with pytest.raises(ValueError):
        ab_test(df, "grp", [], "a", "b")


def test_fdr_correct_matches_python_and_duckdb(spark):
    """BH step-up on a textbook p-value set: p_adj equals the
    statsmodels-convention right-to-left running min, reject set
    equals the step-up rule, verified against an exact DuckDB window
    replay too."""
    import duckdb
    import pytest

    from data_export_tool_spark.operators.experiment import fdr_correct

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216,
          0.222, 0.251, 0.269, 0.275, 0.34, 0.341, 0.384, 0.569, 0.594, 0.696,
          0.762, 0.94, 0.942, 0.975, 0.986]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(ps)], "metric int, p_value double")
    got = {
        r["metric"]: (r["p_rank"], round(r["p_adj"], 9), r["reject_fdr"])
        for r in fdr_correct(df, alpha=0.05).collect()
    }
    # python reference (BH, statsmodels convention)
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    adj = [0.0] * m
    run = 1.0
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        run = min(run, m * ps[i] / rank)
        adj[i] = run
    for i in range(m):
        assert got[i][1] == pytest.approx(adj[i], abs=1e-9), i
        assert got[i][2] == (adj[i] <= 0.05)
    # the classic result on this Benjamini-Hochberg 1995 dataset:
    # exactly the 4 smallest p-values are rejected at alpha=0.05?
    # compute instead of asserting folklore:
    n_rej = sum(1 for i in range(m) if adj[i] <= 0.05)
    assert sum(got[i][2] for i in range(m)) == n_rej
    # DuckDB window replay
    want = {
        int(i): round(float(a), 9)
        for i, a in duckdb.sql(
            """
        WITH t AS (SELECT unnest(range(25)) AS metric,
                          unnest([0.001,0.008,0.039,0.041,0.042,0.06,0.074,
                                  0.205,0.212,0.216,0.222,0.251,0.269,0.275,
                                  0.34,0.341,0.384,0.569,0.594,0.696,0.762,
                                  0.94,0.942,0.975,0.986]) AS p),
        r AS (SELECT *, row_number() OVER (ORDER BY p) AS rk,
                     count(*) OVER () AS m FROM t)
        SELECT metric, least(1.0, min(m * p / rk) OVER (
          ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        FROM r
        """
        ).fetchall()
    }
    ok = all(got[i][1] == want[i] for i in range(m))
    record_opcheck("fdr_correct", m, ok)
    assert ok


def test_fdr_correct_tied_p_values(spark):
    """ADVICE r6: tied p-values must share one adjusted value AND one
    verdict. The old desc-p-only ROWS frame ordered ties arbitrarily,
    so p=[0.01, 0.01] could yield p_adj=[0.02, 0.01] and, at an alpha
    between them, different reject_fdr for identical p. Pinned against
    the python reference with a rank tie-break (which gives every tied
    row the tie group's smallest m*p/rank term)."""
    import pytest

    from data_export_tool_spark.operators.experiment import fdr_correct

    cases = [
        [0.01, 0.01],
        [0.01, 0.01, 0.01],
        [0.02, 0.02, 0.5, 0.5, 0.9],
        [0.03, 0.01, 0.03, 0.2, 0.01],
    ]
    for ps in cases:
        m = len(ps)
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(ps)], "metric int, p_value double"
        )
        got = {
            r["metric"]: (round(r["p_adj"], 9), r["reject_fdr"])
            for r in fdr_correct(df, alpha=0.018).collect()
        }
        # python reference: right-to-left running min over ranks
        order = sorted(range(m), key=lambda i: ps[i])
        adj = [0.0] * m
        run = 1.0
        for rank in range(m, 0, -1):
            i = order[rank - 1]
            run = min(run, m * ps[i] / rank)
            adj[i] = run
        # within a tie group every row gets the group's min adj
        from collections import defaultdict

        tie_min = defaultdict(lambda: 1.0)
        for i in range(m):
            tie_min[ps[i]] = min(tie_min[ps[i]], adj[i])
        for i in range(m):
            assert got[i][0] == pytest.approx(tie_min[ps[i]], abs=1e-9), (ps, i)
            assert got[i][1] == (tie_min[ps[i]] <= 0.018), (ps, i)
        # identical p -> identical (p_adj, verdict), always
        seen = defaultdict(set)
        for i in range(m):
            seen[ps[i]].add(got[i])
        assert all(len(v) == 1 for v in seen.values()), dict(seen)


def test_fdr_grouped_and_contracts(spark):
    from data_export_tool_spark.operators.experiment import fdr_correct

    df = spark.createDataFrame(
        [("e1", 0.01), ("e1", 0.04), ("e1", 0.9), ("e2", 0.2), ("e2", None)],
        "exp string, p_value double",
    )
    out = fdr_correct(df, by=("exp",), alpha=0.05).collect()
    got = {(r["exp"], r["p_value"]): (r["p_rank"], r["reject_fdr"]) for r in out}
    # NULL p excluded entirely
    assert len(out) == 4
    # family e1 (m=3): adj = [0.03, 0.06, 0.9] -> only 0.01 rejected
    assert got[("e1", 0.01)][1] is True
    assert got[("e1", 0.04)][1] is False
    assert got[("e2", 0.2)] == (1, False)
    import pytest as _pt

    with _pt.raises(ValueError):
        fdr_correct(df, alpha=0.0)


def test_mann_whitney_matches_python_replay(spark, sf_dir):
    """Exact U/delta/z/p vs a midrank python replay on real skewed
    prices, the literature small case, the all-ties degenerate, and
    the stochastic-order law."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import mann_whitney

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_orderkey") % 17 == 0)
        .select(
            F.col("l_returnflag").alias("g"),
            F.col("l_extendedprice").cast("double").alias("v"),
        )
        .where(F.col("g").isin("A", "N"))
    )
    got = mann_whitney(li, "v", "g", "A", "N").first()

    rows = [(r["g"], r["v"]) for r in li.collect()]
    vals = sorted(v for _, v in rows)
    # midranks
    mr = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        for _ in range(i, j):
            mr[vals[i]] = (i + 1 + j) / 2.0
        i = j
    n_a = sum(1 for g, _ in rows if g == "A")
    n_b = sum(1 for g, _ in rows if g == "N")
    r_a = sum(mr[v] for g, v in rows if g == "A")
    u_a = r_a - n_a * (n_a + 1) / 2.0
    delta = 2.0 * u_a / (n_a * n_b) - 1.0
    n = n_a + n_b
    from collections import Counter

    t3 = sum(c**3 - c for c in Counter(v for _, v in rows).values())
    var_u = n_a * n_b / 12.0 * ((n + 1) - t3 / (n * (n - 1.0)))
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(var_u)
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert got["n_a"] == n_a and got["n_b"] == n_b
    assert got["u_a"] == pytest.approx(u_a, abs=1e-6)
    assert got["cliffs_delta"] == pytest.approx(delta, abs=1e-9)
    assert got["z"] == pytest.approx(z, abs=1e-6)
    assert got["p_value"] == pytest.approx(p, rel=1e-6, abs=1e-12)
    from tests.conftest import record_opcheck

    record_opcheck("mann_whitney", n, True, oracle="python-reference")

    # literature-style small case with ties: replay law holds and a
    # clean stochastic dominance is called
    small = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0),
         ("b", 4.0), ("b", 5.0), ("b", 5.0), ("b", 6.0)],
        "g string, v double",
    )
    s = mann_whitney(small, "v", "g", "a", "b").first()
    assert s["cliffs_delta"] == pytest.approx(-1.0)  # every a < every b
    assert s["direction"] == "up" and s["p_value"] < 0.05
    # all-ties degenerate: no variance, honest NULLs
    flat = spark.createDataFrame(
        [("a", 5.0)] * 4 + [("b", 5.0)] * 4, "g string, v double"
    )
    f = mann_whitney(flat, "v", "g", "a", "b").first()
    assert f["cliffs_delta"] == 0.0 and f["z"] is None and f["direction"] == "none"
    # empty arm: NULL row, not a crash
    e = mann_whitney(small.where("g = 'a'"), "v", "g", "a", "b").first()
    assert e["n_b"] == 0 and e["u_a"] is None


def test_proportion_test_matches_python_replay(spark, sf_dir):
    import math

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import proportion_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 2 == 0).alias("arm_a"),
        (F.col("event_type") == "purchase").cast("int").alias("converted"),
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
    )
    got = proportion_test(ev, "converted", "arm", "A", "B").first()
    rows = [(r["arm"], r["converted"]) for r in ev.collect()]
    n_a = sum(1 for a, c in rows if a == "A" and c is not None)
    n_b = sum(1 for a, c in rows if a == "B" and c is not None)
    k_a = sum(c for a, c in rows if a == "A" and c is not None)
    k_b = sum(c for a, c in rows if a == "B" and c is not None)
    p_a, p_b = k_a / n_a, k_b / n_b
    pooled = (k_a + k_b) / (n_a + n_b)
    z = (p_b - p_a) / math.sqrt(pooled * (1 - pooled) * (1 / n_a + 1 / n_b))
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert got["rate_a"] == pytest.approx(p_a, abs=1e-9)
    assert got["rate_b"] == pytest.approx(p_b, abs=1e-9)
    assert got["z"] == pytest.approx(z, abs=1e-6)
    assert got["p_value"] == pytest.approx(p, rel=1e-6, abs=1e-12)
    from tests.conftest import record_opcheck

    record_opcheck("proportion_test", n_a + n_b, True, oracle="python-reference")
    # degenerate: zero conversions everywhere -> honest NULL z
    none = spark.createDataFrame(
        [("A", 0), ("A", 0), ("B", 0)], "arm string, converted int"
    )
    d = proportion_test(none, "converted", "arm", "A", "B").first()
    assert d["z"] is None and d["significant"] is None
    # empty arm
    e = proportion_test(
        none.where("arm = 'A'"), "converted", "arm", "A", "B"
    ).first()
    assert e["n_b"] == 0 and e["rate_a"] is None


def test_cuped_reduces_variance_without_bias(spark):
    """CUPED law on a constructed experiment: the adjusted metric's
    variance drops by ~rho^2 while the A/B mean difference (the
    treatment effect) is preserved; theta replays exactly; NULL
    covariates keep the raw metric."""
    import random

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import (
        ab_test,
        cuped_adjust,
    )

    rng = random.Random(7)
    rows = []
    for i in range(4000):
        pre = rng.gauss(100, 20)              # pre-period covariate
        noise = rng.gauss(0, 5)
        arm = "B" if i % 2 else "A"
        effect = 3.0 if arm == "B" else 0.0
        rows.append((arm, pre, 0.8 * pre + noise + effect))
    df = spark.createDataFrame(rows, "arm string, pre double, y double")
    adj = cuped_adjust(df, "y", "pre")
    # theta replay
    xs = [p for _, p, _ in rows]
    ys = [y for _, _, y in rows]
    mx = sum(xs) / len(xs)
    my = sum(ys) / len(ys)
    cxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (len(xs) - 1)
    vx = sum((x - mx) ** 2 for x in xs) / (len(xs) - 1)
    theta = cxy / vx
    got = {
        (r["arm"], r["pre"]): r["y_cuped"]
        for r in adj.collect()
    }
    for arm, pre, y in rows[:200]:
        assert got[(arm, pre)] == pytest.approx(
            y - theta * (pre - mx), abs=1e-9
        )
    # variance shrinks a lot (rho^2 ~ (0.8*20)^2/((0.8*20)^2+25) ≈ .91)
    raw = ab_test(df, "arm", ["y"], "A", "B").first()
    cup = ab_test(adj, "arm", ["y_cuped"], "A", "B").first()
    diff_raw = raw["mean_b"] - raw["mean_a"]
    diff_cup = cup["mean_b"] - cup["mean_a"]
    # the adjusted estimate is CLOSER to the designed effect (3.0) than
    # the raw one — CUPED removes the pre-period imbalance the raw
    # difference carries — and the sensitivity (t) rises sharply
    assert abs(diff_cup - 3.0) <= abs(diff_raw - 3.0) + 1e-9
    assert diff_cup == pytest.approx(3.0, abs=0.6)
    assert abs(cup["t_stat"]) > abs(raw["t_stat"]) * 2  # sensitivity up
    # NULL covariate keeps raw metric
    wn = spark.createDataFrame(
        [("A", None, 7.0)], "arm string, pre double, y double"
    )
    both = cuped_adjust(df.unionByName(wn), "y", "pre").where(
        F.col("pre").isNull()
    ).first()
    assert both["y_cuped"] == 7.0
    from tests.conftest import record_opcheck

    record_opcheck("cuped_adjust", 200, True, oracle="python-reference")


def test_chi2_sf_literature_values():
    """py_chi2_sf vs the published chi-square 0.05/0.01 quantiles and
    a symmetry sanity range."""
    import pytest

    from data_export_tool_spark.operators.experiment import py_chi2_sf

    # (x, dof, sf) from standard tables
    for x, dof, sf in [
        (3.841458820694124, 1, 0.05),
        (5.991464547107979, 2, 0.05),
        (7.814727903251179, 3, 0.05),
        (6.634896601021213, 1, 0.01),
        (9.210340371976182, 2, 0.01),
        (0.0, 5, 1.0),
    ]:
        assert py_chi2_sf(x, dof) == pytest.approx(sf, rel=1e-9, abs=1e-12)
    # monotone decreasing in x
    vals = [py_chi2_sf(x / 10.0, 4) for x in range(0, 300, 7)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_srm_check_matches_python_replay(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import (
        py_chi2_sf,
        srm_check,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm")
    )
    got = srm_check(ev, "arm", {"A": 0.5, "B": 0.5}).first()
    rows = [r["arm"] for r in ev.collect()]
    n = len(rows)
    na = sum(1 for a in rows if a == "A")
    nb = n - na
    chi2 = (na - n * 0.5) ** 2 / (n * 0.5) + (nb - n * 0.5) ** 2 / (n * 0.5)
    assert got["n_total"] == n and got["dof"] == 1
    assert got["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert got["p_value"] == pytest.approx(py_chi2_sf(chi2, 1), rel=1e-9)
    # verdict equals the replay's (the driver events' user ids are NOT
    # parity-balanced — 56/44 at sf0.001 — so the detector rightly
    # fires on this "experiment": exactly the bug SRM exists to catch)
    assert got["srm_detected"] is (py_chi2_sf(chi2, 1) < 1e-3)
    from tests.conftest import record_opcheck

    record_opcheck("srm_check", n, True, oracle="python-reference")

    # a genuinely balanced split stays quiet
    ok_split = spark.createDataFrame(
        [("A",)] * 5000 + [("B",)] * 4980, "arm string"
    )
    q = srm_check(ok_split, "arm", {"A": 0.5, "B": 0.5}).first()
    assert q["srm_detected"] is False

    # a genuinely broken split screams, and unexpected arms disclose
    broken = spark.createDataFrame(
        [("A",)] * 700 + [("B",)] * 300 + [("C",)] * 5, "arm string"
    )
    b = srm_check(broken, "arm", {"A": 0.5, "B": 0.5}).first()
    assert b["srm_detected"] is True and b["n_unexpected"] == 5
    assert b["n_total"] == 1000
    arms = {a["arm"]: a for a in b["arms"]}
    assert arms["A"]["n"] == 700 and arms["A"]["observed_share"] == 0.7
    with pytest.raises(ValueError):
        srm_check(broken, "arm", {"A": 0.5, "B": 0.4})
    with pytest.raises(ValueError):
        srm_check(broken, "arm", {})


def test_experiment_power_matches_closed_form(spark):
    import math

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import (
        _py_probit,
        experiment_power,
    )

    # probit sanity vs published quantiles
    assert _py_probit(0.975) == pytest.approx(1.959963985, abs=1e-6)
    assert _py_probit(0.8) == pytest.approx(0.8416212336, abs=1e-6)
    assert _py_probit(0.5) == 0.0

    df = spark.range(10000).select(
        ((F.col("id") * 2654435761) % 1000 / 100.0).alias("m")
    )
    got = experiment_power(df, "m", mde=0.1, n_per_arm=5000).first()
    rows = [r["m"] for r in df.collect()]
    mean = sum(rows) / len(rows)
    var = sum((v - mean) ** 2 for v in rows) / (len(rows) - 1)
    z = (_py_probit(0.975) + _py_probit(0.8)) ** 2
    n_req = math.ceil(2 * var * z / 0.1**2)
    mde_det = math.sqrt(2 * var * z / 5000)
    assert got["n_pilot"] == len(rows)
    assert got["metric_var"] == pytest.approx(var, rel=1e-9)
    assert got["n_per_arm_required"] == n_req
    assert got["mde_detectable"] == pytest.approx(mde_det, abs=1e-6)
    from tests.conftest import record_opcheck

    record_opcheck("experiment_power", 1, True, oracle="python-reference")
    with pytest.raises(ValueError):
        experiment_power(df, "m")
    with pytest.raises(ValueError):
        experiment_power(df, "m", mde=-1.0)


def test_msprt_matches_replay_and_peeking_law(spark):
    """mSPRT closed form vs a python replay, plus the property it
    exists for: under H0 the always-valid p stays above alpha at EVERY
    prefix ('peek'), while a real effect is eventually detected."""
    import math
    import random

    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import msprt_always_valid

    rng = random.Random(3)
    null_rows = [("A" if i % 2 else "B", rng.gauss(10, 2)) for i in range(6000)]
    eff_rows = [
        ("A" if i % 2 else "B", rng.gauss(10, 2) + (0.5 if i % 2 == 0 else 0))
        for i in range(6000)
    ]
    # replay law on the full effect sample
    df = spark.createDataFrame(eff_rows, "g string, m double")
    got = msprt_always_valid(df, "m", "g", "A", "B").first()
    a = [m for g, m in eff_rows if g == "A"]
    b = [m for g, m in eff_rows if g == "B"]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((v - ma) ** 2 for v in a) / (len(a) - 1)
    vb = sum((v - mb) ** 2 for v in b) / (len(b) - 1)
    s2 = ((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2)
    V = s2 * (1 / len(a) + 1 / len(b))
    diff = mb - ma
    lam = math.sqrt(V / (V + V)) * math.exp(diff**2 * V / (2 * V * (V + V)))
    assert got["lambda_"] == pytest.approx(lam, rel=1e-6)
    assert got["p_always_valid"] == pytest.approx(min(1.0, 1 / lam), rel=1e-6)
    from tests.conftest import record_opcheck

    record_opcheck("msprt_always_valid", 2, True, oracle="python-reference")
    # peeking: under H0 no prefix crosses; under H1 the full sample does
    for rows, expect_detect in ((null_rows, False), (eff_rows, True)):
        detected = False
        for frac in (0.25, 0.5, 0.75, 1.0):
            d = spark.createDataFrame(
                rows[: int(len(rows) * frac)], "g string, m double"
            )
            r = msprt_always_valid(d, "m", "g", "A", "B").first()
            detected = detected or bool(r["significant"])
        assert detected is expect_detect, (expect_detect, frac)


def test_bayes_ab_exact_matches_monte_carlo(spark, sf_dir):
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from data_export_tool_spark.operators.experiment import bayes_ab

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        (F.col("event_type") == "purchase").cast("int").alias("converted"),
    )
    got = bayes_ab(ev, "converted", "arm", "A", "B").first()
    assert got["method"] == "exact"
    a_a, b_a = 1.0 + got["k_a"], 1.0 + got["n_a"] - got["k_a"]
    a_b, b_b = 1.0 + got["k_b"], 1.0 + got["n_b"] - got["k_b"]
    rng = np.random.default_rng(7)
    pa = rng.beta(a_a, b_a, 4_000_000)
    pb = rng.beta(a_b, b_b, 4_000_000)
    assert got["prob_b_beats_a"] == pytest.approx(
        float((pb > pa).mean()), abs=2e-3
    )
    assert got["expected_loss_b"] == pytest.approx(
        float(np.maximum(pa - pb, 0).mean()), abs=2e-4
    )
    assert got["expected_loss_a"] == pytest.approx(
        float(np.maximum(pb - pa, 0).mean()), abs=2e-4
    )
    from tests.conftest import record_opcheck

    record_opcheck(
        "bayes_ab", got["n_a"] + got["n_b"], True, oracle="monte-carlo",
        value=got["prob_b_beats_a"],
    )


def test_bayes_ab_symmetry_degenerates_and_normal_path(spark):
    from data_export_tool_spark.operators.experiment import bayes_ab

    # perfectly symmetric arms -> P = 0.5 exactly, equal losses
    import pytest

    sym = spark.createDataFrame(
        [("A", 1), ("A", 0), ("B", 1), ("B", 0)] * 50,
        "arm string, converted int",
    )
    r = bayes_ab(sym, "converted", "arm", "A", "B").first()
    assert r["prob_b_beats_a"] == pytest.approx(0.5, abs=1e-12)
    assert r["expected_loss_a"] == pytest.approx(r["expected_loss_b"], rel=1e-9)
    # empty arm -> honest NULLs
    e = bayes_ab(
        sym.where("arm = 'A'"), "converted", "arm", "A", "B"
    ).first()
    assert e["n_b"] == 0 and e["prob_b_beats_a"] is None
    # normal fallback (tiny exact_limit) stays close to exact
    big = spark.createDataFrame(
        [("A", 1)] * 400 + [("A", 0)] * 600 + [("B", 1)] * 450 + [("B", 0)] * 550,
        "arm string, converted int",
    )
    exact = bayes_ab(big, "converted", "arm", "A", "B").first()
    approx = bayes_ab(
        big, "converted", "arm", "A", "B", exact_limit=10
    ).first()
    assert exact["method"] == "exact" and approx["method"] == "normal"
    assert approx["prob_b_beats_a"] == pytest.approx(
        exact["prob_b_beats_a"], abs=5e-3
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="priors"):
        bayes_ab(sym, "converted", "arm", "A", "B", alpha_prior=0.0)
